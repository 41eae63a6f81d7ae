"""TSDF fusion / raycast / tracking / surface extraction tests on an
analytic scene (a flat wall at known depth)."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.refine.fusion import (
    create_volume,
    extract_surface,
    fuse_frame,
    raycast,
    track_camera,
)

H, W = 60, 80
K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
IDENTITY = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)


def make_wall_volume(wall_z=1.0, num_classes=3, wall_cls=2, frames=3):
    vol = create_volume(48, num_classes, origin=(-0.6, -0.6, 0.5), voxel_size=0.025)
    depth = np.full((H, W), wall_z, np.float32)
    prob = np.zeros((H, W, num_classes), np.float32)
    prob[..., wall_cls] = 1.0
    for _ in range(frames):
        vol = fuse_frame(
            vol, jnp.asarray(depth), jnp.asarray(prob), jnp.asarray(K), jnp.asarray(IDENTITY)
        )
    return vol, depth


def test_fuse_creates_zero_crossing_at_wall():
    vol, _ = make_wall_volume(wall_z=1.0)
    tsdf = np.asarray(vol.tsdf)
    # voxel layer just in front of the wall: positive; behind: <= 0
    # z index for 0.975m ≈ (0.975-0.5)/0.025 = 19 ; for 1.05m = 22
    assert float(vol.weight.max()) >= 3.0
    center = tsdf[24, 24, :]
    front = center[16]  # z = 0.9 → sdf +0.1 → clipped +1
    back = center[21]  # z = 1.025 → sdf −0.025/τ0.04 = −0.625
    untouched = center[23]  # z = 1.075 → beyond −τ, never updated → +1
    assert front > 0.5
    assert back < -0.3
    assert untouched == 1.0


def test_raycast_recovers_wall_depth():
    vol, _ = make_wall_volume(wall_z=1.0)
    depth, pts, labels = raycast(
        vol, jnp.asarray(K), jnp.asarray(IDENTITY), height=H, width=W,
        near=0.55, far=1.6, num_steps=128,
    )
    d = np.asarray(depth)
    inner = d[20:40, 25:55]
    assert (inner > 0).mean() > 0.9
    np.testing.assert_allclose(inner[inner > 0], 1.0, atol=0.03)
    # labels at hits carry the fused class
    lab = np.asarray(labels)[20:40, 25:55]
    assert (lab[inner > 0] == 2).mean() > 0.95


def test_track_camera_recovers_z_shift():
    vol, depth = make_wall_volume(wall_z=1.0)
    model_depth, _, _ = raycast(
        vol, jnp.asarray(K), jnp.asarray(IDENTITY), height=H, width=W,
        near=0.55, far=1.6, num_steps=128,
    )
    # new frame: wall appears at 0.97 → camera moved +0.03 in z
    depth_new = np.full((H, W), 0.97, np.float32)
    rt = track_camera(
        jnp.asarray(depth_new), model_depth, jnp.asarray(K), jnp.asarray(IDENTITY),
        num_iters=8,
    )
    t = np.asarray(rt[:, 3])
    assert abs(t[2] - 0.03) < 0.01, t
    # rotation stays near identity
    assert np.allclose(np.asarray(rt[:, :3]), np.eye(3), atol=0.02)


def test_extract_surface_points_on_wall():
    vol, _ = make_wall_volume(wall_z=1.0)
    pts, labels, valid = extract_surface(vol, max_points=4096)
    p = np.asarray(pts)[np.asarray(valid)]
    l_ = np.asarray(labels)[np.asarray(valid)]
    assert p.shape[0] > 100
    # surface points concentrate near z = 1.0
    assert abs(np.median(p[:, 2]) - 1.0) < 0.05
    assert (l_ == 2).mean() > 0.9


def test_extract_mesh_sphere_geometry():
    """Marching tetrahedra recovers an analytic sphere: every triangle
    vertex lies on the iso-surface within sub-voxel error and the total
    mesh area matches 4πr² (coverage without holes/duplicates)."""
    import jax.numpy as jnp

    from posecnn_tpu.refine.fusion import TSDFVolume, extract_mesh

    g, vox, r = 32, 0.01, 0.09
    c = np.array([0.155, 0.155, 0.155], np.float32)
    idx = np.arange(g) * vox
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    d = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
    tsdf = np.clip((d - r) / 0.04, -1, 1).astype(np.float32)
    prob = np.tile(np.array([0.2, 0.8], np.float32), (g, g, g, 1))
    vol = TSDFVolume(
        tsdf=jnp.asarray(tsdf),
        weight=jnp.ones((g, g, g), jnp.float32),
        prob=jnp.asarray(prob),
        origin=jnp.zeros(3, jnp.float32),
        voxel_size=jnp.asarray(np.float32(vox)),
    )
    verts, labels, valid = extract_mesh(vol, max_triangles=20000)
    verts, labels, valid = map(np.asarray, (verts, labels, valid))
    assert valid.sum() > 2000
    v = verts[valid].reshape(-1, 3)
    dist = np.abs(np.linalg.norm(v - c, axis=1) - r)
    assert dist.max() < vox  # sub-voxel surface accuracy
    assert np.all(labels[valid] == 1)
    tv = verts[valid]
    area = 0.5 * np.linalg.norm(
        np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1
    ).sum()
    assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.02


def test_extract_mesh_unobserved_voxels_excluded():
    import jax.numpy as jnp

    from posecnn_tpu.refine.fusion import TSDFVolume, extract_mesh

    g = 16
    tsdf = np.ones((g, g, g), np.float32)
    tsdf[:, :, :8] = -1.0  # crossing plane at z≈8
    weight = np.zeros((g, g, g), np.float32)
    weight[:, :8] = 1.0  # only half the volume observed
    vol = TSDFVolume(
        tsdf=jnp.asarray(tsdf),
        weight=jnp.asarray(weight),
        prob=jnp.ones((g, g, g, 2), jnp.float32) * 0.5,
        origin=jnp.zeros(3, jnp.float32),
        voxel_size=jnp.asarray(np.float32(0.01)),
    )
    verts, _, valid = extract_mesh(vol, max_triangles=4096)
    verts, valid = np.asarray(verts), np.asarray(valid)
    assert valid.sum() > 0
    # all triangles live in the observed half (y index < 8 → y < 0.08)
    assert verts[valid][:, :, 1].max() <= 0.08 + 1e-6


def test_save_mesh_ply_welds_and_roundtrips(tmp_path):
    """PLY export (ref save_model kinect_fusion.cpp:592-630): welded
    vertex count is far below 3·T, faces index in range, and parsing
    the file back reproduces the triangle geometry exactly."""
    from posecnn_tpu.refine.fusion import save_mesh_ply

    # two triangles sharing an edge -> 4 unique vertices, not 6
    verts = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    labels = np.array([3, 5], np.int32)
    valid = np.array([True, True])
    path = str(tmp_path / "model.ply")
    n = save_mesh_ply(path, verts, labels, valid)
    assert n == 2
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in lines if l.startswith("element face")][0].split()[-1])
    assert nv == 4 and nf == 2
    body = lines[lines.index("end_header") + 1 :]
    vtx = np.array([[float(x) for x in l.split()] for l in body[:nv]], np.float32)
    for i, l in enumerate(body[nv : nv + nf]):
        parts = [int(x) for x in l.split()]
        assert parts[0] == 3 and parts[-1] == labels[i]
        tri = vtx[parts[1:4]]
        # same triangle as input up to vertex order (welding is exact)
        assert sorted(map(tuple, tri)) == sorted(map(tuple, verts[i]))


def test_extract_mesh_consistent_outward_orientation():
    """Every valid triangle's geometric normal points away from the
    sphere center — orientation is normalized along the TSDF gradient
    (the reference orients via reversed-winding save_model;
    kinect_fusion.cpp:592-630)."""
    import jax.numpy as jnp

    from posecnn_tpu.refine.fusion import TSDFVolume, extract_mesh

    g, vox, r = 32, 0.01, 0.09
    c = np.array([0.155, 0.155, 0.155], np.float32)
    idx = np.arange(g) * vox
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    d = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
    tsdf = np.clip((d - r) / 0.04, -1, 1).astype(np.float32)
    vol = TSDFVolume(
        tsdf=jnp.asarray(tsdf),
        weight=jnp.ones((g, g, g), jnp.float32),
        prob=jnp.ones((g, g, g, 2), jnp.float32) * 0.5,
        origin=jnp.zeros(3, jnp.float32),
        voxel_size=jnp.asarray(np.float32(vox)),
    )
    verts, _, valid = extract_mesh(vol, max_triangles=20000)
    verts, valid = np.asarray(verts), np.asarray(valid)
    tv = verts[valid]
    normals = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    outward = tv.mean(axis=1) - c
    assert (np.sum(normals * outward, axis=1) > 0).all()


def test_save_mesh_ply_welds_one_ulp_and_degenerate_default(tmp_path):
    """Quantized welding merges endpoints that differ by one ulp
    (opposite-order edge interpolation), and valid=None drops the
    all-equal-vertex padding rows."""
    from posecnn_tpu.refine.fusion import save_mesh_ply

    a = np.float32(0.1)
    a_ulp = np.nextafter(a, np.float32(1.0), dtype=np.float32)
    verts = np.array(
        [
            [[0, 0, 0], [a, 0, 0], [0, 1, 0]],
            [[a_ulp, 0, 0], [1, 1, 0], [0, 1, 0]],
            [[0.5, 0.5, 0.5]] * 3,  # degenerate padding row
        ],
        np.float32,
    )
    path = str(tmp_path / "m.ply")
    n = save_mesh_ply(path, verts, labels=None, valid=None)
    assert n == 2  # degenerate row dropped without a valid mask
    lines = open(path).read().splitlines()
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    assert nv == 4  # 6 corners − 2 shared (one exact, one 1-ulp weld)


def test_save_mesh_ply_drops_invalid(tmp_path):
    from posecnn_tpu.refine.fusion import save_mesh_ply

    verts = np.zeros((3, 3, 3), np.float32)
    verts[1] = np.eye(3)
    n = save_mesh_ply(
        str(tmp_path / "m.ply"),
        verts,
        np.array([1, 2, 3]),
        np.array([False, True, False]),
    )
    assert n == 1
