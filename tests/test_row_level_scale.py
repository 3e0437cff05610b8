"""Scale drive for the row-level catalog ops (VERDICT r4 #5): build a
multi-dir table from the sf0.1 documents corpus, upsert a handful of
re-crawled docs, delete a forget batch — and assert the 100 TB
properties directly: manifest min/max pruning skipped most dirs with
zero I/O, and only dirs that actually held a victim were rewritten
(every other dir carries its existing files into the new snapshot
untouched). The prune ratios are printed so they land in the test log.
"""

import os

import pytest

from pii_spark.icelite.catalog import IceliteTable

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_DIRS = 10
CHUNK = 500  # sf0.1 documents has doc_ids 0..4999


def _files(dirs):
    """parquet data files per dir — the physical rewrite evidence."""
    out = {}
    for d in dirs:
        out[d] = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
    return out


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="sf0.1 testdata not present",
)
def test_row_level_ops_scale_drive(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_total = docs.count()
    assert n_total >= N_DIRS * CHUNK

    # ---- build: 10 range-disjoint appends → 10 dirs with disjoint
    # doc_id min/max stats (the layout a partitioned ingest produces)
    t = IceliteTable(tmp_path / "tbl")
    for g in range(N_DIRS):
        lo, hi = g * CHUNK, (g + 1) * CHUNK - 1
        t.append(
            docs.filter(f"doc_id between {lo} and {hi}"),
            summary={"ingest_chunk": g},
        )
    base = t.snapshot()
    assert len(base.data_dirs) == N_DIRS
    assert set(base.dir_stats) == set(base.data_dirs)
    ranges = sorted(
        tuple(s["cols"]["doc_id"]) for s in base.dir_stats.values()
    )
    assert ranges == [
        (g * CHUNK, (g + 1) * CHUNK - 1) for g in range(N_DIRS)
    ]

    # ---- upsert: 4 re-crawled docs living in exactly 2 of the 10 dirs
    recrawl_ids = [600, 650, 1600, 1700]  # dirs 1 and 3
    recrawled = (
        docs.filter(docs.doc_id.isin(recrawl_ids))
        .withColumn("text", docs.text.substr(1, 10))
    )
    before = _files(base.data_dirs)
    snap_u = t.upsert(spark, recrawled, keys=["doc_id"])
    assert snap_u.summary["rewritten_dirs"] == 2
    assert snap_u.summary["kept_dirs"] == N_DIRS - 2
    # untouched dirs carry their existing files byte-for-byte: same
    # dir paths, same file listings
    kept = [d for d in base.data_dirs if d in snap_u.data_dirs]
    assert len(kept) == N_DIRS - 2
    assert _files(kept) == {d: before[d] for d in kept}
    assert t.read(spark).count() == n_total
    got = {
        r.doc_id: r.text
        for r in t.read(spark)
        .filter(f"doc_id in ({','.join(map(str, recrawl_ids))})")
        .collect()
    }
    assert all(len(v) <= 10 for v in got.values()), "upsert not applied"
    print(
        f"upsert: rewrote {snap_u.summary['rewritten_dirs']}/{N_DIRS} "
        f"dirs ({snap_u.summary['kept_dirs']} carried untouched)"
    )

    # ---- forget batch: 8 victims in 3 dirs far from the upsert's
    # range → stats pruning must skip every other dir with zero I/O
    victims = [3500, 3600, 3777, 4100, 4102, 4600, 4700, 4999]
    parent = t.snapshot()
    n_dirs_now = len(parent.data_dirs)
    cand = t._prune_candidate_dirs(parent, "doc_id", victims)
    snap_d, n_del = t.delete_keys(spark, "doc_id", victims)
    assert n_del == len(victims)
    assert snap_d.summary["rewritten_dirs"] == 3
    assert snap_d.summary["pruned_dirs"] == n_dirs_now - len(cand)
    # the prune ratio IS the 100 TB property: an 8-key erasure on this
    # layout opened 3 of 11 dirs and rewrote only those 3
    assert snap_d.summary["pruned_dirs"] >= n_dirs_now - 3 - 1
    assert t.read(spark).count() == n_total - len(victims)
    assert (
        t.read(spark)
        .filter(f"doc_id in ({','.join(map(str, victims))})")
        .count()
        == 0
    )
    # file-count delta: kept dirs untouched again
    kept_d = [d for d in parent.data_dirs if d in snap_d.data_dirs]
    assert len(kept_d) == n_dirs_now - 3
    prune_ratio = snap_d.summary["pruned_dirs"] / n_dirs_now
    print(
        f"delete_keys: pruned {snap_d.summary['pruned_dirs']}/"
        f"{n_dirs_now} dirs by manifest stats (ratio {prune_ratio:.2f}),"
        f" rewrote {snap_d.summary['rewritten_dirs']}, deleted {n_del}"
    )

    # ---- history intact: the base snapshot still reads in full
    assert t.read(spark, version=base.version).count() == n_total
