from posecnn_tpu.refine.icp import ICPResult, icp_refine_batch, refine_pose_icp
from posecnn_tpu.refine.ransac import (
    CenterEstimate,
    PoseEstimate,
    estimate_center,
    estimate_pose_3d,
)
from posecnn_tpu.refine.fusion import (
    TSDFVolume,
    create_volume,
    extract_mesh,
    extract_surface,
    fuse_frame,
    raycast,
    track_camera,
)

__all__ = [
    "refine_pose_icp",
    "icp_refine_batch",
    "ICPResult",
    "estimate_center",
    "estimate_pose_3d",
    "CenterEstimate",
    "PoseEstimate",
    "TSDFVolume",
    "create_volume",
    "fuse_frame",
    "raycast",
    "track_camera",
    "extract_surface",
    "extract_mesh",
]
