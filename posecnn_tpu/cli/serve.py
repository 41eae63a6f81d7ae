"""Inference serving API (ROS-free deployment).

Replaces the reference's ROS node (ref: ros/listener.py:13-38
ImageListener subscribing RGB-D topics and publishing PoseCNNMsg —
label image + rois + poses, ros/src/posecnn/msg/PoseCNNMsg.msg): a
dependency-free HTTP JSON endpoint with the same payload contract.

  POST /infer   body: {"image": [[...]] RGB uint8 HxWx3 (or base64
                 "image_b64" of raw bytes + "shape"), optional
                 "depth": HxW meters, optional "intrinsics": 3x3}
  → {"detections": [{"class", "class_name", "quat_wxyz", "trans",
       "roi", "score"}], "label_shape": [H, W], "seconds": t}
  GET /healthz  → {"ok": true}

The model is compiled once at startup for a fixed input shape (TPU
static-shape discipline); arbitrary-size inputs are center-padded.
"""

from __future__ import annotations

import base64
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


class InferenceEngine:
    """Compiled single-frame PoseCNN inference with fixed shapes."""

    def __init__(self, cfg, num_classes, points, extents, symmetry, k,
                 height=480, width=640, ckpt=None, class_names=None):
        import jax
        import jax.numpy as jnp

        from posecnn_tpu.core.checkpoint import restore_params
        from posecnn_tpu.engine.evaluate import extract_detections
        from posecnn_tpu.models import PoseCNN
        from posecnn_tpu.ops.nms import nms_per_class

        self.height, self.width = height, width
        self.num_classes = num_classes
        self.class_names = class_names or [str(i) for i in range(num_classes)]
        self.pixel_means = np.asarray(cfg.pixel_means, np.float32)
        self.extract_detections = extract_detections
        self.k_default = k

        model = PoseCNN(
            num_classes=num_classes,
            num_units=cfg.train.num_units,
            fc_dim=cfg.train.fc_dim,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            hough_num_samples=cfg.test.hough_num_samples,
            max_objects=16,
            vote_threshold=-1.0,
        )
        data0 = jnp.zeros((1, height, width, 3), jnp.float32)
        meta0 = np.zeros((1, 48), np.float32)
        meta0[0, :9] = k.flatten()
        meta0[0, 9:18] = np.linalg.inv(k).flatten()
        self._meta0 = meta0
        params = model.init(
            jax.random.PRNGKey(cfg.rng_seed), data0, jnp.asarray(extents),
            jnp.asarray(meta0), train=False,
        )
        if ckpt:
            params, _ = restore_params(ckpt, params)
        self._params = params
        self._extents = jnp.asarray(extents)

        @jax.jit
        def infer(params, data, meta):
            out = model.apply(params, data, self._extents, meta, train=False)
            keep = nms_per_class(out.hough.rois, cfg.test.nms_threshold, out.hough.valid)
            return out.label_2d, out.hough.rois, out.hough.poses_init, out.poses_pred, keep

        self._infer = infer
        self._jnp = jnp
        # warm the compile
        self._infer(self._params, data0, jnp.asarray(meta0))

    def __call__(self, image_rgb: np.ndarray, k: np.ndarray | None = None) -> dict:
        jnp = self._jnp
        h, w = image_rgb.shape[:2]
        canvas = np.zeros((self.height, self.width, 3), np.float32)
        ch, cw = min(h, self.height), min(w, self.width)
        bgr = image_rgb[:ch, :cw, ::-1].astype(np.float32)
        canvas[:ch, :cw] = bgr - self.pixel_means
        meta = self._meta0.copy()
        if k is not None:
            meta[0, :9] = np.asarray(k, np.float32).flatten()
            meta[0, 9:18] = np.linalg.inv(np.asarray(k, np.float64)).astype(np.float32).flatten()
        t0 = time.perf_counter()
        label, rois, poses_init, poses_pred, keep = self._infer(
            self._params, jnp.asarray(canvas[None]), jnp.asarray(meta)
        )
        dets = self.extract_detections(
            rois, poses_init, poses_pred, np.asarray(keep), self.num_classes,
            with_indices=True,
        )
        rois_np = np.asarray(rois)
        dt = time.perf_counter() - t0
        det_rows = [
            {
                "class": int(cls),
                "class_name": self.class_names[int(cls)],
                "quat_wxyz": np.asarray(q).tolist(),
                "trans": np.asarray(t).tolist(),
                "roi": rois_np[i, 2:6].tolist(),
                "score": float(rois_np[i, 6]),
            }
            for cls, q, t, i in dets
        ]
        return {
            "detections": det_rows,
            "label_shape": [self.height, self.width],
            "seconds": dt,
        }


def _decode_image(payload: dict) -> np.ndarray:
    if "image_b64" in payload:
        raw = base64.b64decode(payload["image_b64"])
        shape = payload["shape"]
        return np.frombuffer(raw, np.uint8).reshape(shape)
    return np.asarray(payload["image"], np.uint8)


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/infer":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                image = _decode_image(payload)
                k = np.asarray(payload["intrinsics"], np.float32) if "intrinsics" in payload else None
                self._send(200, engine(image, k))
            except Exception as exc:  # noqa: BLE001 — report to client
                self._send(400, {"error": str(exc)})

    return Handler


def main(argv=None):
    parser = base_parser("PoseCNN inference server (ROS-free deployment)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8475)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument(
        "--bench", type=int, default=0,
        help="run N steady-state requests through the HTTP path and "
        "print one JSON latency line instead of serving forever",
    )
    parser.add_argument(
        "--data_root", default=None,
        help="dataset root with models/ + extents.txt — the REAL class "
        "geometry; serving a trained checkpoint without it falls back "
        "to synthetic stand-in extents (Hough's projected-extent gate "
        "and the RoI sizes will be wrong for real objects)",
    )
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)

    from posecnn_tpu.data.datasets import YCB_CLASSES, YCB_SYMMETRY

    c = len(YCB_CLASSES)
    if args.data_root:
        from posecnn_tpu.data.datasets import YCBVideoDataset

        ds = YCBVideoDataset(args.data_root, "train", num_points=512)
        points = ds.points
        extents = ds.extents
    else:
        print(
            "serve: no --data_root; using synthetic stand-in class "
            "geometry (wrong extents for real checkpoints)", flush=True
        )
        from posecnn_tpu.data.procedural import synthetic_class_library

        proc = synthetic_class_library(c, 512)
        points, extents = proc.points, proc.extents
    k = np.array([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32)
    engine = InferenceEngine(
        cfg, c, points, extents, np.asarray(YCB_SYMMETRY), k,
        height=args.height, width=args.width, ckpt=args.ckpt,
        class_names=list(YCB_CLASSES),
    )
    server = HTTPServer((args.host, args.port), make_handler(engine))
    if args.bench > 0:
        return _bench(server, engine, args)
    print(f"serving on http://{args.host}:{args.port} (POST /infer)")
    server.serve_forever()


def _bench(server, engine, args):
    """Steady-state latency through the REAL HTTP path (not just the
    device graph): spin the server in a thread, POST /infer `--bench`
    times with a full-size image, report percentiles as ONE JSON line.
    This is the measured number behind the deployment claim (the
    reference's ROS node publishes per-frame with no latency report,
    ref: ros/listener.py:13-38)."""
    import http.client
    import threading

    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (args.height, args.width, 3), np.uint8)
    payload = json.dumps(
        {
            "image_b64": base64.b64encode(img.tobytes()).decode(),
            "shape": list(img.shape),
        }
    )
    lat, dev = [], []
    n_warm = 2
    for i in range(args.bench + n_warm):
        conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
        t0 = time.perf_counter()
        conn.request(
            "POST", "/infer", body=payload,
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        body = json.loads(resp.read())
        dt = time.perf_counter() - t0
        conn.close()
        assert resp.status == 200, body
        if i >= n_warm:  # skip compile + cache warmup
            lat.append(dt * 1000)
            dev.append(body["seconds"] * 1000)
    server.shutdown()
    lat_s = np.sort(lat)
    out = {
        "metric": "serve_http_latency",
        "unit": "ms",
        "value": round(float(np.median(lat_s)), 2),
        "p90_ms": round(float(lat_s[int(0.9 * (len(lat_s) - 1))]), 2),
        "mean_device_ms": round(float(np.mean(dev)), 2),
        "n": len(lat_s),
        "height": args.height,
        "width": args.width,
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    main()
