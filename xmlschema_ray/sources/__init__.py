from xmlschema_ray.sources.sinks import chunk_files, resumable_write
from xmlschema_ray.sources.synthetic import (
    VOCAB,
    generate_sequences,
    sequences_from_documents,
    sequences_spec,
    write_sequences_corpus,
)

__all__ = [
    "VOCAB",
    "chunk_files",
    "resumable_write",
    "generate_sequences",
    "sequences_from_documents",
    "sequences_spec",
    "write_sequences_corpus",
]
