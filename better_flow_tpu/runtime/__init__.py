from better_flow_tpu.runtime.slice_buffer import EventRingBuffer
from better_flow_tpu.runtime.dvs_flow import DVSFlow

__all__ = ["EventRingBuffer", "DVSFlow"]
