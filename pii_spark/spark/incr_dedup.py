"""Incremental crawl-snapshot deduplication (SURVEY R78).

Common Crawl publishes a new snapshot every month. A production corpus
is never rebuilt from scratch: the NEW snapshot is deduplicated AGAINST
the already-curated BASE corpus and only the survivors are appended —
the reference workflow of every large pretraining-data pipeline
(CCNet §2.3 recomputes per-snapshot; Dolma and RefinedWeb both dedup
new data against retained data). The reference repo has no dedup at
all; this is a north-rule training-pipeline addition, same family as
`substr_dedup.py` / `para_dedup.py`.

Two tiers, both join-shaped with the heavy text column never shuffled:

1. **exact** — whitespace-normalized content fingerprint. A new doc
   whose fingerprint already occurs in the base is a recrawl of
   unchanged content → dropped, stage ``exact``.
2. **near** — MinHash band signatures (``bands`` bands, one min-hash
   per band over char shingles — the same banding scheme as the
   corpus-internal ``dedup_minhash`` operator). A new doc that shares
   ANY (band, min-hash) bucket with any base doc is an LSH
   near-duplicate of retained content → dropped, stage ``near``.
   Tier 2 only ever sees tier-1 survivors (recrawls don't pay the
   shingle explode).

Scale design (the reason this is incremental-shaped at all):

* The base side compiles to two compact KEY relations — distinct
  fingerprints and distinct (band, min-hash) signatures — that are a
  pure function of the base corpus. At 100 TB these are precomputed
  ONCE per corpus version, stored bucketed by key, and reused for
  every subsequent snapshot; per month you pay one scan of the (much
  smaller) snapshot plus joins against the key tables, never a scan
  of the corpus. ``base_keys()`` exposes exactly that precompute.
* ``hashed=True`` (production) carries 8-byte ``xxhash64`` keys in
  both joins; ``hashed=False`` keeps md5-hex keys so DuckDB can
  replicate byte-for-byte (the driver oracle runs this path). The two
  paths are pinned EXACT-tier-identical by tests/test_incr_dedup.py;
  near-tier flags are hash-function-dependent by LSH construction
  (different hash → different band minima), same as the md5 / xxhash64
  ``dedup_minhash`` variant pair — the tests pin both paths' near
  tiers on constructed collisions instead.
* Both joins are semi/anti on DISTINCT base keys — the build side has
  multiplicity 1 per key, so a viral boilerplate shingle (10^8 docs
  sharing a band bucket) is ONE build-side row, not a hot key. The
  distincts themselves are partial-aggregable (map-side combine).
* 64-bit fingerprint collisions (hashed=True) falsely drop a clean
  new doc at ~n_base/2^64 per doc — the same documented tradeoff as
  ``substr_dedup.hashed`` — never corruption.
* Plan audit (read, not guessed): the snapshot scan + tier-1 join
  lineage executes TWICE — once for the output annotation, once
  replayed under the near-tier's survivor filter — and is
  deliberately never cached (the ``substr_dedup`` tradeoff: a
  snapshot-sized intermediate has no business in executor storage,
  and the snapshot is the SMALL relation here). With precomputed
  ``base_keys`` the replay costs one extra scan of the snapshot and
  of the compact key tables, never of the corpus.

Band semantics: one 32-bit (md5 path) or 64-bit (xxhash64 path)
min-hash per band is the bucket key. With default 4 bands this flags
pairs sharing any band minimum — high recall on near-identical
recrawls (the incremental case: boilerplate rewraps, appended
footers), and the same operating point the corpus-internal
``dedup_minhash`` census uses, so the two operators agree on what
"near" means.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ASCII whitespace class, spelled explicitly so the Spark exprs, the
# DuckDB oracle, and any pure twin agree on CRLF/tab/\x0b text (the
# repo-wide twin-drift standard; see tests/test_property_quality_twins)
_WS = r"[ \t\n\x0b\f\r]+"


def _norm(text: Column) -> Column:
    # collapse-then-trim: after the collapse any edge whitespace is a
    # single plain space, so F.trim (spaces only) and DuckDB trim()
    # agree — a leading newline must not defeat recrawl detection
    return F.trim(
        F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), _WS, " ")
    )


def _fingerprint(text: Column, hashed: bool) -> Column:
    n = _norm(text)
    if hashed:
        return F.xxhash64(n)
    return F.substring(F.md5(n), 1, 16)


def content_fingerprint(text: Column, *, hashed: bool = True) -> Column:
    """The exact-tier recrawl fingerprint (lowercased, ASCII-whitespace
    collapsed, trimmed; xxhash64 or md5-16hex) — ONE definition shared
    by incremental_dedup, base_keys, and the quality jobs'
    ``recrawl_keys`` drop, so a fingerprint written by one is always
    joinable by the others."""
    return _fingerprint(text, hashed)


def _shingles(df: DataFrame, id_col: str, text_col: str,
              shingle_len: int, stride: int) -> DataFrame:
    """(id, shingle) rows — same explode shape as dedup_minhash."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(t) - (shingle_len - 1), F.lit(1)),
            F.lit(stride),
        )
    ).alias("i")
    return df.select(F.col(id_col), pos, t.alias("__t")).select(
        id_col, F.expr(f"substring(__t, i, {shingle_len})").alias("shingle")
    )


def _band_minhashes(sh: DataFrame, id_col: str, bands: int,
                    hashed: bool) -> DataFrame:
    """(id, band, mh) — one min-hash per band.

    md5 path: the 4 bands are disjoint 8-hex-char slices of ONE digest
    per shingle (md5 hashed once — the r2 lesson); xxhash64 path: one
    cheap JVM hash per band with the band index as seed (full 64-bit
    minima per band; slicing one 64-bit hash into 4x16-bit bands would
    leave 65k buckets per band — useless at corpus scale)."""
    if hashed:
        agg = [
            F.min(F.xxhash64(F.lit(b), F.col("shingle"))).alias(f"mh{b}")
            for b in range(bands)
        ]
    else:
        if bands > 4:
            raise ValueError("md5 slicing supports at most 4 bands")
        h = F.md5(F.col("shingle"))
        agg = [
            F.min(F.substring(h, 1 + 8 * b, 8)).alias(f"mh{b}")
            for b in range(bands)
        ]
    per_doc = sh.groupBy(id_col).agg(*agg)
    return per_doc.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).cast("int").alias("band"),
                    F.col(f"mh{b}").alias("mh"),
                )
                for b in range(bands)
            ])
        ).alias("bm"),
    ).select(id_col, F.col("bm.band").alias("band"), F.col("bm.mh").alias("mh"))


def recrawl_keys_identity(keys_dir: str, include_sig: bool = False) -> str:
    """Cheap content identity of a `jobs/run_base_keys.py` output dir:
    md5 over the sorted (name, size) listing of fp.parquet's data
    files — file metadata only, no scan. Recorded by the quality jobs
    per commit so a resume under DIFFERENT base keys (a new corpus
    version) refuses loudly instead of silently mixing recrawl
    semantics across groups/batches.

    ``include_sig`` (review r7b): with the near tier enabled,
    sig.parquet and the recorded geometry are load-bearing too — a
    sig-only change (possible via ``run_base_keys --append`` on an
    arbitrary delta) must be visible to the drift guard — so their
    listing/bytes fold into the hash. Callers pass it iff
    ``recrawl_near`` is on; exact-tier-only identities stay
    byte-compatible with every ledger written before r8."""
    import hashlib
    from pathlib import Path

    def _listing(sub: str) -> list[str]:
        return sorted(
            f"{p.name}:{p.stat().st_size}"
            for p in (Path(keys_dir) / sub).rglob("*.parquet")
            if not p.name.startswith((".", "_"))
        )

    files = _listing("fp.parquet")
    if not files:
        raise FileNotFoundError(
            f"no fp.parquet data files under {keys_dir} — run "
            "jobs/run_base_keys.py first"
        )
    payload = "\n".join(files)
    if include_sig:
        sig_files = _listing("sig.parquet")
        if not sig_files:
            raise FileNotFoundError(
                f"no sig.parquet data files under {keys_dir} — the "
                "near tier needs the signature relation; run "
                "jobs/run_base_keys.py first"
            )
        meta_path = Path(keys_dir) / "keys_meta.json"
        meta = meta_path.read_text() if meta_path.exists() else ""
        payload += "\nsig:" + "\n".join(sig_files) + "\nmeta:" + meta
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def drop_recrawls(df: DataFrame, fp_df: DataFrame,
                  text_col: str = "text") -> DataFrame:
    """Anti-join ``df`` against a fingerprint relation (one ``fp``
    BIGINT column, as written by `jobs/run_base_keys.py`): rows whose
    normalized text already exists in the base corpus are dropped.
    Row-local w.r.t. ``df`` (the build side is distinct), so it
    composes with any upstream reader — parquet groups, WARC groups,
    or streaming micro-batches."""
    from pyspark.sql.types import LongType

    if not isinstance(fp_df.schema["fp"].dataType, LongType):
        # a hand-built md5-path (string) fp table would coerce to
        # NULL bigints and the anti-join would silently drop NOTHING
        # (review r7) — the same match-nothing hazard the geometry
        # guard refuses
        raise ValueError(
            "fp relation must carry BIGINT xxhash64 fingerprints "
            f"(got {fp_df.schema['fp'].dataType.simpleString()}); "
            "build the keys with jobs/run_base_keys.py (hashed path)"
        )
    keyed = df.withColumn(
        "__fp", content_fingerprint(F.col(text_col))
    )
    return keyed.join(
        fp_df, keyed["__fp"] == fp_df["fp"], "left_anti"
    ).drop("__fp")


def drop_recrawls_near(
    df: DataFrame,
    sig_df: DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_len: int = 12,
    stride: int = 5,
    bands: int = 4,
) -> DataFrame:
    """The MinHash NEAR tier of recrawl dropping, in-line (r7: the
    'near tier stays batch-only' limitation was an artifact of the
    stream-static framing — inside ``foreachBatch`` (and inside a
    batch group) the micro-batch is an ordinary DataFrame, so the
    per-doc band-min aggregation is just a batch groupBy). Drops rows
    whose band signature collides with ``sig_df`` (the precomputed
    base (band, mh) relation). Compose AFTER :func:`drop_recrawls` so
    exact recrawls never pay the shingle explode; geometry must match
    the keys' recorded parameters (the callers enforce it via
    keys_meta.json, like run_snapshot_dedup)."""
    near_ids = (
        _band_minhashes(
            _shingles(df, id_col, text_col, shingle_len, stride),
            id_col, bands, hashed=True,
        )
        .join(sig_df, ["band", "mh"], "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(near_ids, id_col, "left_anti")


def base_keys(
    base: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 12,
    stride: int = 5,
    bands: int = 4,
    hashed: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The per-corpus-version precompute: (distinct fingerprints,
    distinct (band, mh) signatures) of the base corpus. At scale these
    are written once (bucketed by their join key) and reused for every
    snapshot; `incremental_dedup` accepts them via ``base_fp`` /
    ``base_sig`` so the monthly job never rescans the corpus."""
    fp = base.select(_fingerprint(F.col(text_col), hashed).alias("fp")).distinct()
    sig = (
        _band_minhashes(
            _shingles(base, id_col, text_col, shingle_len, stride),
            id_col, bands, hashed,
        )
        .select("band", "mh")
        .distinct()
    )
    return fp, sig


def key_delta(
    novel: DataFrame,
    base_fp: DataFrame,
    base_sig: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 12,
    stride: int = 5,
    bands: int = 4,
    hashed: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The keys a NOVEL delta adds to existing key relations — i.e.
    ``keys(base ∪ novel) − keys(base)`` computed WITHOUT touching the
    base corpus (VERDICT r6 missing #1).

    Correct because both key relations are distinct images of per-doc
    functions: a doc's fingerprint and its band minima depend on that
    doc alone, so ``keys(base ∪ novel) = keys(base) ∪ keys(novel)``
    exactly. The anti-join returns only the genuinely new keys, so
    the caller can APPEND them to the stored tables — the monthly
    workflow never rewrites (or re-shuffles) the accumulated key
    tables, and never pays a full-corpus shingle explode again: cost
    is one scan of the delta plus a join against the compact key
    tables, both snapshot-sized."""
    d_fp, d_sig = base_keys(
        novel, id_col=id_col, text_col=text_col,
        shingle_len=shingle_len, stride=stride, bands=bands,
        hashed=hashed,
    )
    return (
        d_fp.join(base_fp, ["fp"], "left_anti"),
        d_sig.join(base_sig, ["band", "mh"], "left_anti"),
    )


def append_key_delta(
    spark,
    novel: DataFrame,
    keys_dir: str,
    *,
    id_col: str = "doc_id",
) -> tuple[int, int]:
    """Fold a novel delta's keys into a `jobs/run_base_keys.py` output
    dir IN PLACE: compute :func:`key_delta` with the dir's RECORDED
    signature geometry (keys_meta.json — required; mixing geometries
    would band-match nothing), write the delta to a temp dir, then
    move its data files into fp.parquet/ / sig.parquet/. Appending
    files — never rewriting the accumulated tables — keeps the update
    at delta cost; global key distinctness is preserved because the
    delta is anti-joined against the stored keys (tier-1's left join
    relies on multiplicity 1 per fingerprint). Part-file names carry
    job UUIDs, so moves cannot collide.

    The dir's content identity (``recrawl_keys_identity`` — the file
    listing) changes with the append, so quality-job resume guards
    see the new key set, exactly as if the keys had been recomputed.

    Returns (fingerprints added, band signatures added). Local/posix
    paths only (the offline sandbox); a cluster deployment would do
    the same two-phase move through the Hadoop FileSystem API."""
    import json
    import shutil
    import uuid as _uuid
    from pathlib import Path

    kd = Path(keys_dir)
    meta_path = kd / "keys_meta.json"
    if not meta_path.exists():
        raise FileNotFoundError(
            f"{meta_path} is missing — append needs the recorded "
            "signature geometry; run jobs/run_base_keys.py first"
        )
    km = json.loads(meta_path.read_text())
    if not km.get("hashed", True):
        # md5-path key dirs are check-scale artifacts; appending
        # xxhash64 deltas into them would poison the tables with keys
        # no consumer can match (review r7)
        raise ValueError(
            f"{keys_dir} records hashed=false (md5 oracle path) — "
            "production key maintenance requires the xxhash64 path; "
            "rebuild with jobs/run_base_keys.py"
        )
    base_fp = spark.read.parquet(str(kd / "fp.parquet"))
    base_sig = spark.read.parquet(str(kd / "sig.parquet"))
    d_fp, d_sig = key_delta(
        novel, base_fp, base_sig,
        id_col=id_col, text_col=km.get("text_col", "text"),
        shingle_len=km["shingle_len"], stride=km["stride"],
        bands=km["bands"], hashed=True,
    )
    added = []
    for name, df in (("fp", d_fp), ("sig", d_sig)):
        tmp = kd / f"_append_tmp_{name}_{_uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(tmp))
        n = spark.read.parquet(str(tmp)).count()
        if n:
            for f in tmp.glob("*.parquet"):
                shutil.move(str(f), str(kd / f"{name}.parquet" / f.name))
        shutil.rmtree(tmp)
        added.append(n)
    return added[0], added[1]


def incremental_dedup(
    base: DataFrame | None,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 12,
    stride: int = 5,
    bands: int = 4,
    hashed: bool = True,
    base_fp: DataFrame | None = None,
    base_sig: DataFrame | None = None,
) -> DataFrame:
    """Annotate every NEW-snapshot doc with ``drop_stage``:
    ``'exact'`` (recrawl of base content), ``'near'`` (MinHash band
    collision with base content), or NULL (novel — append it).

    Pass either ``base`` (keys derived inline) or precomputed
    ``base_fp``/``base_sig`` from :func:`base_keys`.

    Tier 1 is annotated ROW-locally (a left join against the distinct
    fingerprint relation — multiplicity 1 per key, so rows are never
    multiplied and ``id_col`` plays no role). Tier 2 attributes band
    collisions back to docs BY id (shingles are grouped per doc), so
    ``new`` must carry unique non-NULL ids for tier-2 survivors —
    the same contract as ``jobs/run_dedup.py``, which validates it
    loudly up front; callers composing this operator into a job
    should do the same (two id-column aggregates)."""
    if base_fp is None or base_sig is None:
        if base is None:
            raise ValueError("need base or (base_fp, base_sig)")
        base_fp, base_sig = base_keys(
            base, id_col=id_col, text_col=text_col,
            shingle_len=shingle_len, stride=stride,
            bands=bands, hashed=hashed,
        )

    keyed = new.withColumn("__fp", _fingerprint(F.col(text_col), hashed))
    bfp = base_fp.select(
        F.col("fp").alias("__bfp"), F.lit(True).alias("__ex")
    )
    marked = keyed.join(
        bfp, keyed["__fp"] == bfp["__bfp"], "left"
    ).drop("__bfp")

    # tier 2 shingles only tier-1 survivors: recrawls never pay the
    # explode (at snapshot scale the exact tier typically removes the
    # majority of rows — CC monthly self-overlap is large)
    survivors = marked.filter(F.col("__ex").isNull())
    near_ids = (
        _band_minhashes(
            _shingles(survivors, id_col, text_col, shingle_len, stride),
            id_col, bands, hashed,
        )
        .join(base_sig, ["band", "mh"], "left_semi")
        .select(F.col(id_col).alias("__nid"))
        .distinct()
        .withColumn("__nr", F.lit(True))
    )

    out = (
        marked.join(near_ids, marked[id_col] == near_ids["__nid"], "left")
        .withColumn(
            "drop_stage",
            F.when(F.col("__ex"), F.lit("exact"))
            .when(F.col("__nr"), F.lit("near"))
            .otherwise(F.lit(None).cast("string")),
        )
        .drop("__fp", "__ex", "__nid", "__nr")
    )
    return out
