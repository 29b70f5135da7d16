"""OSM PBF source: block scan, spec-correct decode, writer, Spark reader.

Decode semantics match the reference parser's wire-truth behaviour
(reference: /root/reference lib/OSM_Blob.js, lib/pbfParser.js — see
SURVEY.md §1, §5.3 for the verified golden outputs). The engine's
canonical path is spec-correct; ``mode="osm-read-compat"`` reproduces
the reference OSM_Blob lazy path's string-cache off-by-one for parity
testing (SURVEY.md §5.3 policy).
"""

from .blocks import BlockMeta, scan_blocks
from .decode import decode_blob, decode_header_block, decode_primitive_block
from .reader import pbf_block_index, read_pbf, read_pbf_union
from .sink import write_pbf_dataset
from .writer import write_pbf

__all__ = [
    "BlockMeta",
    "scan_blocks",
    "decode_blob",
    "decode_header_block",
    "decode_primitive_block",
    "pbf_block_index",
    "read_pbf",
    "read_pbf_union",
    "write_pbf",
    "write_pbf_dataset",
]
