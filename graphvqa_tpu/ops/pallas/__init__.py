from graphvqa_tpu.ops.pallas.blocked_aggregate import (
    pallas_blocked_aggregate, pallas_available)

__all__ = ["pallas_blocked_aggregate", "pallas_available"]
