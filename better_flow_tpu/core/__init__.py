from better_flow_tpu.core.events import EventSlice
from better_flow_tpu.core.model import MotionModel

__all__ = ["EventSlice", "MotionModel"]
