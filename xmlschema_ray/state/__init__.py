"""Cross-run state: lineage manifests and resume (see engine.checkpoint)."""

from xmlschema_ray.engine.checkpoint import Manifest, ShardRecord, shard_dir, write_shard_atomic

__all__ = ["Manifest", "ShardRecord", "shard_dir", "write_shard_atomic"]
