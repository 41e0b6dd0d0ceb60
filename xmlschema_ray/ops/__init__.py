from xmlschema_ray.ops.relational import (
    anti_join,
    broadcast_join,
    combiner_aggregate,
    semi_join,
    topk,
)

__all__ = ["anti_join", "broadcast_join", "combiner_aggregate", "semi_join", "topk"]
