"""Cross-engine-deterministic hashing column builders.

Everything the dedup / fingerprint operators hash with must produce the SAME
value in Spark and in the DuckDB oracle (the driver hash-compares values).
``xxhash64``/``hash`` differ between engines, so the engine standardizes on
**md5** (identical everywhere) reinterpreted as an integer:

    hash64(s) = int(hex(md5(s))[0:15], 16)        # 60 bits, fits BIGINT

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)::bigint`` — all JVM-side
built-ins, whole-stage-codegen friendly, no Python in the hot path.
DuckDB: ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``.

md5 is ~2x slower than xxhash64 but still >100 MB/s/core JVM-side; at 100 TB
scale the hash cost is dwarfed by the shuffle it feeds. Swap to xxhash64 in
production where cross-engine determinism is not required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_fingerprint(col: Column | str) -> Column:
    """Full 128-bit md5 hex fingerprint (exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


# --- MinHash rehashing ------------------------------------------------------
# One md5 base hash per shingle, then H cheap affine derivations
# sig_h = ((base % P) * a_h + b_h) % P  — 24 md5s/shingle would be ~10x the
# CPU for identical statistical behavior. P = 2^31-1 (Mersenne) keeps
# (P-1)*a_h + b_h < 2^62: no BIGINT overflow in either engine (DuckDB errors
# on int64 overflow rather than wrapping, so staying in range is mandatory).

MINHASH_PRIME = 2_147_483_647


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_h, b_h) pairs derived from md5 — stable across
    engines/versions because they're literals baked into both plans."""
    import hashlib

    out = []
    for h in range(num_hashes):
        a = int(hashlib.md5(f"minhash-a-{h}".encode()).hexdigest()[:8], 16) % (
            MINHASH_PRIME - 2
        ) + 1
        b = int(hashlib.md5(f"minhash-b-{h}".encode()).hexdigest()[:8], 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def affine_coeffs(salt: str, n: int) -> list[tuple[int, int]]:
    """``n`` deterministic (a, c) affine-rehash pairs for deriving many
    cheap uniforms from ONE md5 base hash: u_k = ((base % P) * a_k + c_k)
    % P. Same bounds as the MinHash coefficients ((P-1)*a + c < 2^62 — no
    BIGINT overflow in either engine); ``salt`` namespaces independent
    families (minhash, bootstrap resamples, permutation tests...)."""
    import hashlib

    out = []
    for k in range(n):
        a = int(
            hashlib.md5(f"{salt}-a-{k}".encode()).hexdigest()[:8], 16
        ) % (MINHASH_PRIME - 2) + 1
        c = int(
            hashlib.md5(f"{salt}-c-{k}".encode()).hexdigest()[:8], 16
        ) % MINHASH_PRIME
        out.append((a, c))
    return out
