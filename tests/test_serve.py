"""HTTP serving API: contract test with a tiny model on an ephemeral
port (healthz, inference payload, malformed-request handling)."""

import base64
import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

from posecnn_tpu.cli.serve import InferenceEngine, make_handler
from posecnn_tpu.core.config import cfg_from_dict


@pytest.fixture(scope="module")
def server():
    cfg = cfg_from_dict(
        {"train": {"num_classes": 4, "num_units": 8}, "test": {"hough_num_samples": 32}}
    )
    rng = np.random.RandomState(0)
    c = 4
    points = (rng.rand(c, 32, 3).astype(np.float32) - 0.5) * 0.12
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    engine = InferenceEngine(
        cfg, c, points, extents, np.zeros(c, np.float32), k, height=48, width=64
    )
    srv = HTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_healthz(server):
    resp = json.loads(urllib.request.urlopen(server + "/healthz").read())
    assert resp == {"ok": True}


def test_infer_contract(server, rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    body = json.dumps(
        {"image_b64": base64.b64encode(img.tobytes()).decode(), "shape": [48, 64, 3]}
    ).encode()
    req = urllib.request.Request(
        server + "/infer", data=body, headers={"Content-Type": "application/json"}
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    assert set(resp) == {"detections", "label_shape", "seconds",
                         "batch_seconds", "batch_size"}
    assert resp["label_shape"] == [48, 64]
    for det in resp["detections"]:
        assert set(det) == {"class", "class_name", "quat_wxyz", "trans", "roi", "score"}
        assert len(det["quat_wxyz"]) == 4
        assert len(det["trans"]) == 3


def test_malformed_request_is_clean_400(server):
    req = urllib.request.Request(
        server + "/infer", data=b'{"nope": 1}', headers={"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope")
    assert exc.value.code == 404


def test_infer_scores_descending(server, rng):
    """roi/score pairing regression: detections must come back ordered
    by score with each row's fields from the SAME roi."""
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    body = json.dumps(
        {"image_b64": base64.b64encode(img.tobytes()).decode(), "shape": [48, 64, 3]}
    ).encode()
    req = urllib.request.Request(
        server + "/infer", data=body, headers={"Content-Type": "application/json"}
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    scores = [d["score"] for d in resp["detections"]]
    assert scores == sorted(scores, reverse=True)


def test_bench_flag_reports_latency(capsys):
    """--bench runs steady-state requests through the real HTTP path
    and prints ONE JSON line with median/percentile latency."""
    from posecnn_tpu.cli.serve import _bench, make_handler

    cfg = cfg_from_dict(
        {"train": {"num_classes": 4, "num_units": 8}, "test": {"hough_num_samples": 32}}
    )
    rng = np.random.RandomState(1)
    c = 4
    points = (rng.rand(c, 32, 3).astype(np.float32) - 0.5) * 0.12
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    engine = InferenceEngine(
        cfg, c, points, extents, np.zeros(c, np.float32), k, height=48, width=64
    )
    srv = HTTPServer(("127.0.0.1", 0), make_handler(engine))

    class Args:
        host = "127.0.0.1"
        port = srv.server_address[1]
        bench = 3
        height = 48
        width = 64
        batch = 1
        concurrency = 0

    rc = _bench(srv, engine, Args())
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "serve_http_latency"
    assert rec["n"] == 3
    assert rec["value"] > 0 and rec["p90_ms"] >= rec["value"] * 0.5
    assert rec["mean_device_ms"] > 0


def test_microbatched_server_coalesces_concurrent_requests(rng):
    """--batch path: a batch-2 engine behind a MicroBatcher +
    ThreadingHTTPServer must answer concurrent requests with each
    client's OWN frame's detections (rois carry a batch column; a
    mixup would hand one client the other's boxes)."""
    import concurrent.futures
    from http.server import ThreadingHTTPServer

    from posecnn_tpu.cli.serve import MicroBatcher, make_handler

    cfg = cfg_from_dict(
        {"train": {"num_classes": 4, "num_units": 8}, "test": {"hough_num_samples": 32}}
    )
    c = 4
    points = (rng.rand(c, 32, 3).astype(np.float32) - 0.5) * 0.12
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    engine = InferenceEngine(
        cfg, c, points, extents, np.zeros(c, np.float32), k,
        height=48, width=64, batch=2,
    )
    batcher = MicroBatcher(engine, max_wait_ms=50.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, batcher))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        imgs = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(2)]
        # per-frame reference answers through the non-batched engine path
        solo = [engine.infer_batch([im], [None])[0] for im in imgs]

        def post(im):
            body = json.dumps(
                {"image_b64": base64.b64encode(im.tobytes()).decode(),
                 "shape": [48, 64, 3]}
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer", data=body,
                headers={"Content-Type": "application/json"},
            )
            return json.loads(urllib.request.urlopen(req).read())

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            got = list(ex.map(post, imgs))
        for resp, ref in zip(got, solo):
            assert set(resp) == {"detections", "label_shape", "seconds",
                         "batch_seconds", "batch_size"}
            assert len(resp["detections"]) == len(ref["detections"])
            for d, r in zip(resp["detections"], ref["detections"]):
                assert d["class"] == r["class"]
                np.testing.assert_allclose(d["roi"], r["roi"], atol=1e-4)
    finally:
        srv.shutdown()


def test_infer_returns_rle_label_on_request(server, rng):
    """return_label=true adds the PoseCNNMsg label image, RLE-encoded
    (ref: ros/src/posecnn/msg/PoseCNNMsg.msg label field)."""
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    body = json.dumps({
        "image_b64": base64.b64encode(img.tobytes()).decode(),
        "shape": [48, 64, 3],
        "return_label": True,
    }).encode()
    req = urllib.request.Request(
        server + "/infer", data=body, headers={"Content-Type": "application/json"}
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    assert "label_rle" in resp
    rle = resp["label_rle"]
    assert rle["shape"] == [48, 64]
    counts = rle["counts"]
    # decode: values at even idx, run lengths at odd idx
    total = sum(counts[1::2])
    assert total == 48 * 64
    decoded = np.repeat(np.asarray(counts[0::2]), np.asarray(counts[1::2]))
    label = decoded.reshape(48, 64)
    assert label.min() >= 0 and label.max() < 4
    # without the flag the field stays absent (bandwidth default)
    body2 = json.dumps({
        "image_b64": base64.b64encode(img.tobytes()).decode(),
        "shape": [48, 64, 3],
    }).encode()
    req2 = urllib.request.Request(
        server + "/infer", data=body2, headers={"Content-Type": "application/json"}
    )
    resp2 = json.loads(urllib.request.urlopen(req2).read())
    assert "label_rle" not in resp2
