"""Replicates the driver's correctness gate locally: run every
__spark_entry__.queries() entry and its oracle_sql() twin via DuckDB on the
same parquet; compare row count, column names, and order-insensitive
values. Usage: python tools/check_contract.py [sf_dir]"""

import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose exact-equality oracle rests on a CORPUS-VALIDATED
# probabilistic-recall assumption (ADVICE r02): the LSH candidate stages
# (minhash 16x4 banding + est-0.5 prefilter, simhash 8-band pigeonhole
# for hamming<=7, and the clustering built on them) provably contain
# every true pair ON THIS CORPUS/PARAMETER POINT, so the exact all-pairs
# SQL is a full oracle here — but a new corpus or parameter tweak can
# break equality without the code being wrong (miss probability
# ~1-2e-4 per true pair for minhash). A mismatch on ONLY these queries
# should be triaged as a recall-assumption violation first.
CORPUS_VALIDATED = {
    "doc_minhash_near_dups", "doc_simhash_near_dups",
    "doc_incremental_near_dup",
    "doc_near_dup_clusters", "emb_ann_topk", "emb_ivf_topk",
    "emb_ivf_multi_topk", "emb_ivf_join_topk",
    # planted-truth geometry: clones co-cluster with originals and are
    # their only cosine-0.99 neighbors ON THIS CORPUS (random 64-dim,
    # max background cosine ~0.5)
    "emb_semantic_dedup",
}


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    from rdflib_jsonld_spark.plans.pipeline import build_session
    spark = build_session("local[8]", "contract-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok-rows-only  {name}: {len(rows)} rows  [{dt:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"cols {sorted(cols)} != {sorted(ocols)}"))
            print(f"FAIL  {name}: column mismatch {sorted(cols)} vs {sorted(ocols)}")
            continue
        a, b = norm_rows(cols, rows), norm_rows(ocols, orows)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} != {len(b)}"))
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ: {diffs}"))
            print(f"FAIL  {name}: values differ, e.g. {diffs}")
            continue
        tag = "  (corpus-validated LSH-recall oracle)" \
            if name in CORPUS_VALIDATED else ""
        print(f"ok            {name}: {len(rows)} rows match oracle"
              f"  [{dt:.1f}s]{tag}")

    print(f"\n{len(failures)} failures / {len([n for n in qs if not only or n in only])} queries")
    for name, msg in failures:
        print(" -", name, ":", msg[:200])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
