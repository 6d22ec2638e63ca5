"""Column-function helpers (SURVEY §2.4 P10 + little-endian readers).

These are plain Catalyst column expressions — usable in any DataFrame,
whole-stage-codegen-able, no Python at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def format_pubkey_short(col) -> Column:
    """P10 (`common/utils.rs:103-110`): 'abcd...wxyz' display form;
    strings of length <= 8 pass through unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) <= 8, c).otherwise(
        F.concat(F.substring(c, 1, 4), F.lit("..."),
                 F.substring(c, -4, 4)))


def le_uint(binary_col, offset: int, nbytes: int) -> Column:
    """Little-endian unsigned integer read from a BinaryType column at
    1-based `offset` — hex-pair reassembly + conv (exact through u64;
    conv is unsigned-64). The JVM-side alternative to a decode UDF for
    fixed-layout prefixes (used by the J2 pre-scan in plans/pipeline.py).

    NB: F.reverse on BinaryType goes through a string cast and mangles
    bytes — this helper exists so callers don't rediscover that.
    """
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    h = F.hex(F.substring(c, offset, nbytes))
    be = F.concat(*[F.substring(h, 1 + 2 * i, 2)
                    for i in range(nbytes - 1, -1, -1)])
    return F.conv(be, 16, 10).cast("decimal(20,0)")


def le_u64(binary_col, offset: int = 1) -> Column:
    return le_uint(binary_col, offset, 8)


def le_u32(binary_col, offset: int = 1) -> Column:
    return le_uint(binary_col, offset, 4).cast("long")
