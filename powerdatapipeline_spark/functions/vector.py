"""Vector math over ``array<float|double>`` columns (SURVEY.md §2.12:
similarity search over ``embeddings.embedding``).

All JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no
Python UDFs, so dot products stay inside whole-stage codegen and scale
linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def array_lit(values) -> Column:
    """Literal ``array<double>`` / ``array<array<double>>`` built in ONE
    JVM call (round 15). ``F.lit(nested_list)`` RECURSES into
    per-element ``lit()`` Py4J round trips — a 16×64 centroid literal
    costs ~1,000 gateway calls, and cProfile put 6-7 s of q35's 7 s
    plan-build inside those socket reads. Serializing the matrix to one
    SQL expression string keeps the exact doubles (shortest-repr ``D``
    literals parse back through ``Double.parseDouble``, which inverts
    ``repr``'s shortest round-trip form bit-exactly) and makes the whole
    build a single parse call. Finite values only — plane/centroid/
    codebook constants by construction."""
    import math

    def fmt(x) -> str:
        fx = float(x)
        if not math.isfinite(fx):
            raise ValueError(f"array_lit: non-finite literal {x!r}")
        return repr(fx) + "D"

    # ndim check FIRST: ``values and …`` on a multi-element numpy array
    # raises on ambiguous truthiness before reaching any isinstance
    # (ADVICE r15 — latent, all current callers pass lists)
    if hasattr(values, "ndim"):
        if getattr(values, "ndim", 1) == 2:
            body = ",".join(
                "array(" + ",".join(fmt(x) for x in row) + ")"
                for row in values)
            return F.expr(f"array({body})")
        values = list(values)
    if len(values) == 0:
        raise ValueError(
            "array_lit: empty input has no element type; pass at least "
            "one value (an untyped array() literal would not bind to "
            "array<double> operations)")
    if isinstance(values[0], (list, tuple)):
        body = ",".join(
            "array(" + ",".join(fmt(x) for x in row) + ")" for row in values)
    else:
        body = ",".join(fmt(x) for x in values)
    return F.expr(f"array({body})")


def dot(a: str | Column, b: str | Column) -> Column:
    """Elementwise product then sum: ``aggregate(zip_with(a, b, *), 0.0, +)``."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def ddot(a: str | Column, b: str | Column) -> Column:
    """Decimal-exact dot product of two array<float> columns: products in
    double (exact IEEE), each rounded to DECIMAL(28,12) identically in any
    engine, summed exactly — so the result is bit-reproducible regardless
    of summation order (DuckDB's list_sum uses compensated summation and
    differs from a plain left fold at ~1e-16). The merge lambda re-casts
    because Spark's decimal addition narrows scale (38,12)+(28,12) →
    (38,11); the cast back is an exact rescale at these magnitudes.

    CAVEAT (diagnosed round 7, q98): Spark's double→decimal cast rounds
    the double's SHORTEST decimal repr (``BigDecimal.valueOf``), not its
    exact binary expansion — at scale 12 this diverges from an
    exact-value rounding (DuckDB's) on ~1e-5 of random products. Safe
    when downstream rounding is ≥ a few digits coarser than the decimal
    scale AND values aren't decimal-tie-prone; for a bit-exact
    cross-engine fold prefer plain-double sums with an IDENTICAL fold
    order (Spark ``aggregate`` ≡ DuckDB ``list_reduce`` left fold — the
    q98 construction)."""
    prod = F.zip_with(_c(a), _c(b), lambda p, q: (p.cast("double") * q.cast("double"))
                      .cast("decimal(28,12)"))
    return F.aggregate(prod, F.lit(0).cast("decimal(38,12)"),
                       lambda acc, v: (acc + v).cast("decimal(38,12)")).cast("double")


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity between two array columns; NULL-safe on zero norms."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def sign_bucket(scores: Column, n_planes: int, offset: int = 0) -> Column:
    """Pack the signs of ``n_planes`` hyperplane margins (elements
    ``offset..offset+n_planes-1`` of a materialized score array) into one
    integer LSH bucket id: bit ``i`` is set iff ``scores[offset+i] >= 0``.

    Shared by the ANN bucketing (similarity.hyperplane_lsh_topk) and the
    near-dup banding (dedup.embedding_neardup_pairs) so the sign convention
    — and any fix to it — lives in exactly one place. Callers materialize
    ``scores`` into a column first; testing signs on the raw transform would
    re-evaluate every interpreted dot product per bit."""
    out = F.lit(0)
    for i in range(n_planes):
        out = out + F.when(scores[offset + i] >= 0,
                           F.lit(2 ** i)).otherwise(F.lit(0))
    return out


def vectorize(cols: list[str], dtype: str = "double") -> Column:
    """dict-record → dense vector (reference ``csvdataset_to_tfdataset``,
    tfdataset.py:89-135): pack named numeric columns into one array column.
    Column names stay in the schema (array is positional; callers keep the
    name list — the engine stores it in column metadata via ``.alias``)."""
    return F.array(*[F.col(c).cast(dtype) for c in cols])
