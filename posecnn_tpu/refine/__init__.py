from posecnn_tpu.refine.icp import refine_pose_icp, icp_refine_batch

__all__ = ["refine_pose_icp", "icp_refine_batch"]
