#!/usr/bin/env python
"""10× scale probe (VERDICT r11 #5): make the 100 TB design claims an
empirical point, not just a plan argument.

Builds an sf1-equivalent dataset by replicating /root/testdata/sf0.1
``--factor`` times (default 10) with SHIFTED keys — each replica is a
disjoint key universe (graphs replicate as disjoint components,
documents as distinct ids, users as distinct users), so per-key
cardinalities and skew SHAPE are preserved while totals scale — then
times the top bench queries at both scales and reports the observed
scaling exponent log(t_big/t_small)/log(factor). An exponent ≈ 1 is
linear (the design claim for the scan/agg/bucketed families); the
graph/iteration queries are expected slightly above 1 (more rounds ≈
log n) — anything ≫ 1 is a red flag the plan audit missed.

Output: one JSON line per query + a summary table appended to stdout;
the round ledger lives in SCALE.md. Scratch data goes under
``.scratch/`` (gitignored) inside the repo — the only writable area.

Usage:
  python tools/scale_probe.py [--build-only] [--factor 10]
      [--queries q156,q153,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: both scales are REBUILT through the same writer (1 MB row groups,
#: single file per table) so input-split geometry is identical and the
#: exponent measures the PLAN's scaling, not file-layout luck — the
#: sf0.1 source file is one big row group that can never split, which
#: would pin the small run to 1 task and fake a sub-linear exponent.
X1 = os.path.join(REPO, ".scratch", "x1")
SCRATCH = os.path.join(REPO, ".scratch", "x10")


def dir_for(factor: int) -> str:
    """Per-factor build dir: .scratch/x{factor}. Keeps the historical
    x1/x10 paths for the single-factor mode and lets ``--factors
    1,10,100`` hold all scales on disk at once (the manifest guards
    each dir independently)."""
    return os.path.join(REPO, ".scratch", f"x{factor}")

#: per-table key columns to shift per replica (disjoint key universes).
#: Non-key attributes (ts, text, embedding, value) stay identical — the
#: probe measures plan scaling, not data novelty. Foreign keys shift in
#: lockstep with their parents so joins keep the same per-key fan-out.
SHIFT_COLS = {
    "region": [],           # tiny dims: replicating would break FK
    "nation": [],           # semantics; keep one copy
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = ["q156", "q153", "q184", "q135", "q253",
                   "q163", "q152", "q214", "q172", "q205"]


def build_at(spark, factor: int, dest: str) -> None:
    """Write each scaled table as a SINGLE parquet FILE named
    ``{table}.parquet`` — the exact testdata layout — because
    ``queries.load_events`` sniffs the parquet footer of that path
    (a directory would break it), and because layout parity keeps the
    two probe runs comparable. Files stay row-group-splittable; the
    probe session lowers ``spark.sql.files.maxPartitionBytes`` so BOTH
    scales parallelize (at the default 128 MB the whole 17 MB sf0.1
    table is one input split and the comparison measures parallelism,
    not scaling)."""
    import glob
    import shutil

    os.makedirs(dest, exist_ok=True)
    # Factor/stride manifest (ADVICE r12): per-table existence checks
    # used to skip rebuilding without verifying WHAT factor the file
    # was built at — rerunning with a different --factor (or resuming
    # an interrupted build) silently probed stale data and reported
    # wrong exponents. The manifest pins (factor, src); a mismatch
    # wipes the build dir and starts clean. It is written AFTER the
    # last table lands, so an interrupted build (no manifest) also
    # rebuilds from scratch.
    manifest_path = os.path.join(dest, "MANIFEST.json")
    # rev bumps when the builder's TRANSFORM changes (round 14: the
    # embeddings per-replica isometry; round 15: the documents
    # per-replica cipher) — same factor/src but different content must
    # rebuild, not silently reuse
    want = {"factor": factor, "src": SRC, "rev": 4}
    have = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            have = json.load(f)
    if have != want:
        stale = [p for p in os.listdir(dest) if p != "MANIFEST.json"]
        if stale:
            print(f"# manifest mismatch (have {have}, want {want}) — "
                  f"rebuilding {len(stale)} stale tables", flush=True)
        for p in os.listdir(dest):
            full = os.path.join(dest, p)
            (shutil.rmtree if os.path.isdir(full)
             else os.remove)(full)
    # ONE GLOBAL stride for every table: per-table strides broke the
    # FK-lockstep invariant (o_custkey shifted by orders' stride while
    # c_custkey shifted by customer's smaller one — replicas >= 1 had
    # dangling FKs, faking sub-linear exponents for any fact⋈dim
    # query; found in round-12 self-review). The committed SCALE.md
    # DEFAULT_QUERIES only join lineitem⋈orders, whose strides
    # coincided, so the recorded numbers stand.
    global_max = 0
    for table, keys in SHIFT_COLS.items():
        if not keys:
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        global_max = max(global_max,
                         max(int(maxes[k] or 0) for k in keys))
    stride = 10 ** len(str(global_max))
    for table, keys in SHIFT_COLS.items():
        out = os.path.join(dest, f"{table}.parquet")
        if os.path.exists(out):
            print(f"# {table}: exists, skipping", flush=True)
            continue
        src_path = os.path.join(SRC, f"{table}.parquet")
        if not keys:
            shutil.copyfile(src_path, out)
            print(f"# {table}: copied (dim)", flush=True)
            continue
        df = spark.read.parquet(src_path)
        rep = df.withColumn(
            "__rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        for k in keys:
            rep = rep.withColumn(
                k, (F.col(k) + F.col("__rep").cast("bigint")
                    * F.lit(stride)).cast(dict(df.dtypes)[k]))
        if table == "embeddings":
            # Verbatim vector replication is degenerate for EVERY
            # similarity/ANN operator, for timing exactly as SCALE.md
            # documents for recall: each replica is its query's true
            # top-1 and collides in every LSH table / IVF cell, so
            # pair emission probes the all-duplicates pathology, not
            # plan scaling (the q163 lesson). Perturb each replica
            # with a norm- and distribution-preserving transform:
            # circular shift by (rep mod dim) positions, sign-flipped
            # every dim-th replica — 2·dim (=128) distinct isometries,
            # enough for factor 100 without aliasing; shifted copies
            # of a random-ish vector are near-orthogonal, so replica
            # cross-collisions stay at background density. rep 0 is
            # the identity (x1 data = source data, same as the
            # documents tag convention).
            dim = int(df.selectExpr("size(embedding) AS d")
                      .first()["d"])
            if factor > 2 * dim:
                # ADVICE r14: the family has exactly 2*dim members, so
                # a bigger factor would alias replicas back to EXACT
                # duplicates — silently reintroducing the pathology
                # this transform exists to avoid, and the manifest rev
                # would not change, so stale-data reuse wouldn't catch
                # it either. Fail loudly; extending the family (e.g.
                # per-replica deterministic permutations) is the fix.
                raise SystemExit(
                    f"embeddings replica-isometry family has only "
                    f"2*dim = {2 * dim} distinct members; factor "
                    f"{factor} would alias replicas into exact "
                    f"duplicates — extend the family before probing "
                    f"past x{2 * dim}")
            sh = ("concat(slice(embedding, "
                  "CAST(pmod(__rep, size(embedding)) AS INT) + 1, "
                  "size(embedding) - CAST(pmod(__rep, size(embedding)) AS INT)), "
                  "slice(embedding, 1, "
                  "CAST(pmod(__rep, size(embedding)) AS INT)))")
            rep = rep.withColumn(
                "embedding",
                F.expr(f"IF(pmod(CAST(__rep / size(embedding) AS INT), 2) = 1, "
                       f"transform({sh}, x -> CAST(-x AS FLOAT)), {sh})"))
        if table == "documents":
            # key-shifting alone leaves `factor` EXACT COPIES of every
            # text — content-collision-driven operators (PPJoin prefix
            # blocks, n-gram postings) then face a quadratically larger
            # TRUE pair space (measured: q163 t×62 at factor 10), which
            # probes the all-duplicates pathology, not plan scaling.
            # Round 14 tagged each replica (" rN" suffix), which fixes
            # EXACT-dup density — but a tag leaves replicas ~0.99-
            # Jaccard NEAR-dups of each other, so near-dup operators
            # still faced a quadratic true-pair space (measured in
            # round 15: q29 emitted 255 / 249k / 27.1M pairs at
            # x1/x10/x100 — C(replicas,2) per source doc, exactly the
            # all-duplicates pathology). The text analog of the
            # embeddings isometry (round 14): a per-replica
            # POLYALPHABETIC cipher (period-2 Vigenère) — letters at
            # even string positions rotate by (rep mod 26), at odd
            # positions by (rep//26 mod 26), digits by (rep//26 mod
            # 10) — 26·26 = 676 distinct letter transforms,
            # deterministic, length/word-boundary/shingle-SHAPE-
            # preserving (the ciphered vocabulary is isomorphic, so df
            # distributions and per-doc statistics are unchanged), and
            # ciphered replicas share only letterless shingles
            # (background density). Two alphabets ON PURPOSE: a single
            # Caesar shift has only 26 members, and at factor 100 the
            # digit-free texts of reps {r, r+26, ...} aliased back to
            # near-dups (measured: q29 emitted 815k pairs at x100 vs
            # the ~26k linear expectation); with period 2 every letter
            # trigram spans both alphabets, no reliance on digits.
            # rep 0 is the identity; the rN tag stays so exact dedup
            # can never alias even past the family size.
            if factor > 676:
                raise SystemExit(
                    "documents cipher family has only 26*26 = 676 "
                    f"distinct members; factor {factor} would alias "
                    "replica texts back into near-duplicates — extend "
                    "the family before probing past x676")
            shl = "pmod(__rep, 26)"
            sh2 = "pmod(CAST(__rep / 26 AS INT), 26)"
            shd = "pmod(CAST(__rep / 26 AS INT), 10)"
            sh = f"IF(pmod(i, 2) = 0, {shl}, {sh2})"
            cipher = f"""concat_ws('', transform(split(text, ''), (c, i) ->
              CASE WHEN c >= 'a' AND c <= 'z'
                     THEN char(97 + pmod(ascii(c) - 97 + {sh}, 26))
                   WHEN c >= 'A' AND c <= 'Z'
                     THEN char(65 + pmod(ascii(c) - 65 + {sh}, 26))
                   WHEN c >= '0' AND c <= '9'
                     THEN char(48 + pmod(ascii(c) - 48 + {shd}, 10))
                   ELSE c END))"""
            rep = rep.withColumn("text", F.expr(cipher))
            rep = rep.withColumn(
                "text", F.concat(F.col("text"), F.lit(" r"),
                                 F.col("__rep").cast("string")))
        tmp_dir = out + ".tmpdir"
        (rep.drop("__rep").coalesce(1)
         .write.mode("overwrite")
         .option("parquet.block.size", 1024 * 1024)
         .parquet(tmp_dir))
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.move(part, out)
        shutil.rmtree(tmp_dir)
        print(f"# {table}: x{factor} -> {dest} (stride {stride})",
              flush=True)
    with open(manifest_path, "w") as f:
        json.dump(want, f)
        f.write("\n")


def probe(spark, stems: list[str], factor: int) -> list[dict]:
    import math

    by_stem = {n.split("_")[0]: n for n in REGISTRY}
    rows = []
    for stem in stems:
        name = by_stem[stem]
        fn, _ = REGISTRY[name]
        fn(spark, "/root/testdata/sf0.001").count()  # JIT warm
        t0 = time.time()
        fn(spark, X1).count()
        t_small = time.time() - t0
        t0 = time.time()
        fn(spark, SCRATCH).count()
        t_big = time.time() - t0
        exp = math.log(t_big / t_small) / math.log(factor)
        row = {"query": name, "t_x1_s": round(t_small, 2),
               f"t_x{factor}_s": round(t_big, 2),
               "exponent": round(exp, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def probe_multi(spark, stems: list[str],
                factors: list[int], best_of: int = 1) -> list[dict]:
    """Three-point (or N-point) probe: time each query at every factor
    in one session and report the exponent PER CONSECUTIVE DECADE —
    log(t_b/t_a)/log(b/a) — so a fixed-overhead-dominated first decade
    (sub-linear) can't mask a super-linear second decade. The x1 run
    still warms JIT per query before any timed pass.

    ``best_of`` (VERDICT r14 #7): single-run cells carry ±0.1 exponent
    of session noise on top of the ambient host band; min-of-N per cell
    (N timed executions back-to-back, same session) strips the
    one-sided noise the same way bench.py --repeat does, making a
    probe-vs-probe regression call cheap instead of an adjudication."""
    import math

    by_stem = {n.split("_")[0]: n for n in REGISTRY}
    rows = []
    for stem in stems:
        name = by_stem[stem]
        fn, _ = REGISTRY[name]
        fn(spark, "/root/testdata/sf0.001").count()  # JIT warm
        times = {}
        for f_ in factors:
            trials = []
            for _ in range(max(1, best_of)):
                t0 = time.time()
                fn(spark, dir_for(f_)).count()
                trials.append(time.time() - t0)
            times[f_] = min(trials)
        row = {"query": name}
        if best_of > 1:
            row["best_of"] = best_of
        for f_ in factors:
            row[f"t_x{f_}_s"] = round(times[f_], 2)
        for a, b in zip(factors, factors[1:]):
            row[f"exp_x{a}_x{b}"] = round(
                math.log(times[b] / times[a]) / math.log(b / a), 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    factor = 10
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    factors = None
    if "--factors" in sys.argv:
        factors = sorted(int(x) for x in
                         sys.argv[sys.argv.index("--factors") + 1]
                         .split(","))
    stems = DEFAULT_QUERIES
    if "--queries" in sys.argv:
        stems = sys.argv[sys.argv.index("--queries") + 1].split(",")
    best_of = 1
    if "--best-of" in sys.argv:
        best_of = int(sys.argv[sys.argv.index("--best-of") + 1])
    spark = get_spark("scale-probe", extra_conf={
        # split the single-file tables finely so BOTH scales use the
        # full local core count — mirrors the many-splits 100 TB regime
        "spark.sql.files.maxPartitionBytes": str(1024 * 1024)})
    spark.sparkContext.setLogLevel("ERROR")
    if factors:
        for f_ in factors:
            build_at(spark, f_, dir_for(f_))
        if "--build-only" in sys.argv:
            return
        rows = probe_multi(spark, stems, factors, best_of=best_of)
        print(json.dumps({"factors": factors, "results": rows}))
        return
    build_at(spark, 1, X1)
    build_at(spark, factor, SCRATCH)
    if "--build-only" in sys.argv:
        return
    rows = probe(spark, stems, factor)
    print(json.dumps({"factor": factor, "results": rows}))


if __name__ == "__main__":
    main()
