from better_flow_tpu.parallel.mesh import make_event_mesh
from better_flow_tpu.parallel.event_parallel import process_slice_event_parallel

__all__ = ["make_event_mesh", "process_slice_event_parallel"]
