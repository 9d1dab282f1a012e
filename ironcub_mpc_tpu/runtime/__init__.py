from .trajectory import Trajectory, load_npz, upsample  # noqa: F401
