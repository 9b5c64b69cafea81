"""Persisted ANN index: the amortizable IVF/quantization artifacts as
an on-disk, servable store.

Every serving-path knob of :mod:`..operators.ann` accepts precomputed
frames (``centroids``, ``assignments``, ``salts``, ``quantized``,
``pq_codebooks_df``/``pq_codes_df``) because at 100 TB the prep — one
corpus-sized assignment pass, the quantized twins, the trained
codebooks — is a build-time cost you pay ONCE, not per query batch
(measured: prep dominates the local ANN legs, BENCH_ANN.json).  This
module gives those artifacts the same lifecycle the text index has:

* :func:`build_ann_index` — train/pin centroids, assign the corpus,
  derive the int8 and PQ twins, write everything to ``out_dir`` with a
  manifest;
* :func:`load_ann_index` / :meth:`AnnIndex.query` — serve external
  query batches from the persisted artifacts (``ivf_dense_topk`` with
  every amortizable input supplied; no per-batch prep jobs);
* :func:`add_vectors` — LSM-flavoured append: new vectors are assigned
  to the FROZEN centroids and their twin rows appended in O(batch),
  exactly like delta segments keep the text index's models frozen
  (retraining is a rebuild, by design);
* :func:`delete_vectors` / :func:`compact_ann_index` — Lucene-style
  liveness: deletion writes a ``tombstones.parquet`` sidecar in
  O(tombstones) and every served query masks the assignment scan with
  a broadcast anti-join (deleted vectors can never become candidates);
  compaction folds the tombstones physically (twin + assignment rows
  dropped, counts/manifest recomputed, sidecar retired) — the same
  sidecar-mask / physical-fold split the text index uses
  (checkpoint.delete_docs / compact_index);
* :func:`verify_ann_index` — row-accounting invariants across the
  artifact tables.

Determinism: every artifact is produced by the engine-deterministic
kernels of operators/ann.py (round-before-argmin assignments,
scaled-integer centroid/codebook means, floor(x+0.5) quantization) and
every column round-trips parquet exactly (long / array<double> /
array<float>), so a store-served query is bit-identical to the same
query computed from scratch — the driver gate hashes that equality
end-to-end (gate_training ``ivf_store`` variant).

Reference parity note: the reference engine has no ANN plane; this is
brief-driven (training-data pipeline operators), reusing its index
lifecycle vocabulary (build / serve / append / verify — e.g.
include/pefa/index_build.hpp's staged build + verify pass shape).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.index.checkpoint import (
    _commit_renames,
    _recover_commit,
    _refresh_path,
    _update_lock,
    _write_manifest_atomic,
)
from partitioned_ef_ans_spark.operators import ann as ann_mod
from partitioned_ef_ans_spark.operators.dedup import (
    BUCKET_SALT_TARGET,
    bucket_salts,
)

MANIFEST_KIND = "ann_ivf"
MANIFEST_VERSION = 1


def _read_manifest(out_dir: str) -> dict:
    with open(f"{out_dir}/manifest.json") as fh:
        man = json.load(fh)
    if man.get("kind") != MANIFEST_KIND:
        raise ValueError(f"{out_dir}: not an ANN index (kind={man.get('kind')!r})")
    return man


#: renameat2 function pointer, resolved ONCE (None = not yet tried,
#: False = unsupported) — swaps happen per append/compaction and must
#: not pay a dlopen + symbol lookup each time
_RENAMEAT2 = None


def _rename_exchange(a: str, b: str) -> bool:
    """Atomically EXCHANGE two paths via renameat2(RENAME_EXCHANGE)
    (Linux ≥3.15 / glibc ≥2.28).  Returns False when unsupported so
    callers fall back to the two-rename swap."""
    global _RENAMEAT2
    if _RENAMEAT2 is None:
        try:
            import ctypes

            _RENAMEAT2 = ctypes.CDLL(None, use_errno=True).renameat2
        except Exception:
            _RENAMEAT2 = False
    if _RENAMEAT2 is False:
        return False
    try:
        at_fdcwd = -100
        rename_exchange = 2
        return (
            _RENAMEAT2(
                at_fdcwd,
                os.fsencode(a),
                at_fdcwd,
                os.fsencode(b),
                rename_exchange,
            )
            == 0
        )
    except Exception:
        return False


def _replace_dir(path: str, staging: str) -> None:
    """Swap ``staging`` into ``path``.  Preferred mechanism is an
    atomic renameat2(RENAME_EXCHANGE): the path NEVER goes absent, so
    a reader racing the swap sees the old table or the new one with no
    in-between — load-bearing for ``tombstones.parquet``, where an
    absent path means "no tombstones" and a racing reader would serve
    deleted vectors for the lifetime of its handle.  Fallback is the
    two-rename swap (absent for two syscalls) with a uuid-suffixed
    aside — not pid-suffixed: a crashed swap leaves a non-empty aside,
    and a recycled pid colliding with it would fail the NEXT mutation
    mid-flight (the stale-zip lesson); leftovers are swept by the
    locked mutators' scratch sweep."""
    import shutil
    import uuid

    if os.path.isdir(path) and _rename_exchange(staging, path):
        # staging now holds the OLD table — retire it
        shutil.rmtree(staging, ignore_errors=True)
        return
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def _load_tombstones(spark: SparkSession, out_dir: str) -> DataFrame | None:
    # the sidecar is a single parquet FILE (written via os.replace —
    # the text plane's atomic mechanism); pre-file stores may still
    # carry the legacy directory form, which reads identically
    path = f"{out_dir}/tombstones.parquet"
    return spark.read.parquet(path) if os.path.exists(path) else None


def _write_tombstones_file(out_dir: str, ids) -> int:
    """Replace the tombstone sidecar with the complete ``ids`` set as
    ONE parquet file via ``os.replace`` — atomic for readers (old or
    new complete set, never absent, never torn), crash-safe without
    any aside to recover.  Exactly checkpoint._write_tombstones'
    mechanism; the set is bounded by deletes-since-last-compaction and
    is broadcast to workers anyway, so driver-side materialization is
    the ALREADY-PAID cost, not a new one.  A legacy directory-form
    sidecar is atomically exchanged out where renameat2 exists."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    uniq = sorted({int(x) for x in ids})
    path = f"{out_dir}/tombstones.parquet"
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(
        pa.table({"vec_id": pa.array(uniq, type=pa.int64())}), tmp
    )
    if os.path.isdir(path):
        # legacy dir form: file<->dir os.replace fails — exchange
        # atomically, else retire via an ``.old.`` aside (one-time
        # migration).  The aside — NOT _remove_dir's ``.gone.`` — is
        # what makes the window crash-safe: if we die between the
        # retire and the replace, the path is absent but
        # _recover_swaps restores the aside as the live sidecar, so
        # the store never serves deleted vectors; the aside is only
        # discarded after the new file has landed.
        import shutil

        if _rename_exchange(tmp, path):
            shutil.rmtree(tmp, ignore_errors=True)
            return len(uniq)
        old = f"{path}.old.{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        return len(uniq)
    os.replace(tmp, path)
    return len(uniq)


def _remove_dir(path: str) -> None:
    """Retire an artifact path (directory or single file): atomic
    rename/unlink out of the readers' view, then best-effort removal
    (the sidecar retirement pattern).  No-op when absent."""
    import shutil
    import uuid

    if os.path.isfile(path):
        os.remove(path)
        return
    if not os.path.isdir(path):
        return
    gone = f"{path}.gone.{uuid.uuid4().hex[:8]}"
    os.rename(path, gone)
    shutil.rmtree(gone, ignore_errors=True)


#: scratch / aside name markers every locked mutator may leave behind
#: on a crash; swept (under the writer lock) by _sweep_scratch
_SCRATCH_MARKERS = (".rebuild.", ".retired.")
_ASIDE_MARKERS = (".old.", ".gone.", ".staging.", ".pre_commit", ".tmp.")


def _sweep_scratch(out_dir: str) -> None:
    """Remove crash leftovers — rebuild scratch dirs, retired-artifact
    asides, staging dirs — from the store tree.  Caller holds the
    writer lock and must run :func:`_recover_commit` AND
    :func:`_recover_swaps` first.  An aside is swept ONLY when its
    live base path exists (the swap completed): an aside whose base is
    MISSING is the surviving copy of a crashed fallback swap — the
    tombstone set, say — and deleting it would turn a recoverable
    crash into silent data loss."""
    import shutil

    def _rm(full: str) -> None:
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            try:
                os.remove(full)
            except OSError:
                pass

    for name in os.listdir(out_dir):
        full = f"{out_dir}/{name}"
        if name.startswith(_SCRATCH_MARKERS):
            _rm(full)
            continue
        for m in _ASIDE_MARKERS:
            if m in name:
                base = f"{out_dir}/{name.split(m)[0]}"
                if os.path.exists(base):
                    _rm(full)
                break


def _recover_swaps(out_dir: str) -> None:
    """Roll BACK a crashed fallback two-rename swap: a live path that
    is missing while its ``.old.`` aside survives gets the aside
    restored — the pre-mutation table; the interrupted mutation is
    considered failed and the caller's retry redoes it.  A no-op
    whenever renameat2(RENAME_EXCHANGE) served the swap (always, on
    Linux) and for journaled commits (``_recover_commit`` owns those
    and must run FIRST)."""
    for name in sorted(os.listdir(out_dir)):
        if ".old." not in name or name.startswith(_SCRATCH_MARKERS):
            continue
        base = f"{out_dir}/{name.split('.old.')[0]}"
        if not os.path.exists(base):
            os.rename(f"{out_dir}/{name}", base)


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    *,
    n_centroids: int | None = None,
    trained: bool = True,
    kmeans_iters: int = 2,
    sq8: bool = True,
    pq: bool = False,
    pq_m: int = 8,
    pq_ks: int = 16,
    pq_trained: bool = False,
    pq_iters: int = 2,
    engine: str = "np",
    salt_target: int | None = None,
    source: str | None = None,
) -> dict:
    """Build the persisted IVF store for ``embeddings`` (``vec_id``,
    ``embedding``) under ``out_dir`` and return the manifest.

    Artifacts (each a parquet table):

    * ``centroids.parquet`` (cent_id, cvec) — Lloyd-trained
      (``trained=True``, the production default) or pinned to the
      ``n_centroids`` smallest actual vec_ids;
    * ``assignments.parquet`` (vec_id, bucket) — nearest-centroid
      assignment of every corpus vector (the one corpus-sized pass);
    * ``bucket_counts.parquet`` (bucket, count) — drives hot-bucket
      salting at query time; tiny, and PERFORMANCE-ONLY (salting is
      exactness-preserving at any granularity), so staleness after a
      crashed append can never change results;
    * ``sq8.parquet`` (vec_id, qvec) — the int8 first-pass twin (1/4
      the scan bytes), if ``sq8``;
    * ``pq_codebooks.parquet`` (s, code_id, csub) +
      ``pq_codes.parquet`` (vec_id, s, code) — the product-quantization
      twin (m bytes/vector), if ``pq``.

    The float embedding payload is NOT copied: the store sits next to
    the embeddings table (``source`` records where, informationally)
    the way the text index sits next to its corpus; queries join the
    float column only for the exact rescore of surviving candidates.

    ``engine="np"`` vectorizes the assignment pass (BLAS matmul per
    Arrow batch).  Parity with the HOF fold is test-locked at gate
    scale; in principle a round-6 boundary case could assign a vector
    differently between engines (differing double-sum association),
    which is why the ASSIGNMENTS are persisted: serving always uses
    the build's own assignment, so any such flip changes bucket
    recall microscopically, never correctness."""
    row = embeddings.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("nd"),
    ).collect()[0]
    n_vec = int(row["n"])
    if n_vec == 0:
        raise ValueError("empty embeddings table")
    if int(row["nd"]) != n_vec:
        # mirrors add_vectors' intra-batch duplicate rejection: dup
        # ids would write duplicate assignment/twin rows, fail
        # verify_ann_index's assignment_ids_distinct forever, and
        # repair cannot clear it (it only drops twin orphans)
        raise ValueError(
            f"build_ann_index: {n_vec - int(row['nd'])} duplicate "
            "vec_ids in input embeddings (ids must be unique)"
        )
    dim = len(embeddings.select("embedding").first()["embedding"])
    if n_centroids is None:
        n_centroids = ann_mod.auto_n_centroids(n_vec)
    if salt_target is None:
        salt_target = BUCKET_SALT_TARGET
    os.makedirs(out_dir, exist_ok=True)
    # a REBUILD over an existing store is a mutation like any other:
    # take the writer lock and refresh on entry (the internal
    # read-backs below would otherwise be served from a caller's
    # cached scans of the OLD artifacts — the CacheManager aliasing)
    # and on exit (so post-build readers see the new files)
    with _update_lock(out_dir):
        _refresh_path(spark, out_dir)
        try:
            return _build_ann_index_locked(
                spark, embeddings, out_dir, n_vec=n_vec, dim=dim,
                n_centroids=n_centroids, trained=trained,
                kmeans_iters=kmeans_iters, sq8=sq8, pq=pq, pq_m=pq_m,
                pq_ks=pq_ks, pq_trained=pq_trained, pq_iters=pq_iters,
                engine=engine, salt_target=salt_target, source=source,
            )
        finally:
            _refresh_path(spark, out_dir)


def _build_ann_index_locked(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    *,
    n_vec: int,
    dim: int,
    n_centroids: int,
    trained: bool,
    kmeans_iters: int,
    sq8: bool,
    pq: bool,
    pq_m: int,
    pq_ks: int,
    pq_trained: bool,
    pq_iters: int,
    engine: str,
    salt_target: int,
    source: str | None,
) -> dict:
    # a REBUILD over an existing store must be crash-safe: every new
    # artifact lands in dot-prefixed scratch paths (invisible to
    # readers) and the whole generation — including the retirement of
    # the previous liveness sidecar and of twin dirs this build does
    # not produce — commits through ONE journaled rename set (the text
    # index's _commit_renames roll-forward).  A crash anywhere during
    # the build leaves the OLD store fully live, tombstones included
    # (retiring them up front would resurrect deleted vectors on a
    # mid-build crash); a crash during the ms-scale rename window is
    # rolled forward by the next locked mutator's _recover_commit.
    # CONTRACT: lockless readers racing that ms window may observe a
    # mixed generation (same exposure the text plane documents for its
    # journaled commits) — a reader that needs a consistent view
    # during rebuilds uses snapshot_ann_index, which refuses any state
    # with a live lease or commit journal.
    import uuid

    _recover_commit(out_dir)
    _recover_swaps(out_dir)
    _sweep_scratch(out_dir)

    def scratch(name: str) -> str:
        return f"{out_dir}/.rebuild.{name}"

    if trained:
        cent = ann_mod.kmeans_centroids(
            embeddings, n_centroids=n_centroids, iters=kmeans_iters
        )
    else:
        cent = ann_mod._resolve_centroids(embeddings, n_centroids, None)
    cent.write.mode("overwrite").parquet(scratch("centroids.parquet"))
    cent = spark.read.parquet(scratch("centroids.parquet"))

    assigns = ann_mod.assign_buckets(embeddings, cent, engine=engine)
    assigns.write.mode("overwrite").parquet(scratch("assignments.parquet"))
    assigns = spark.read.parquet(scratch("assignments.parquet"))
    assigns.groupBy("bucket").count().write.mode("overwrite").parquet(
        scratch("bucket_counts.parquet")
    )

    built = ["centroids.parquet", "assignments.parquet",
             "bucket_counts.parquet"]
    if sq8:
        ann_mod.sq8_quantize(embeddings).write.mode("overwrite").parquet(
            scratch("sq8.parquet")
        )
        built.append("sq8.parquet")
    if pq:
        if pq_trained:
            cb = ann_mod.pq_codebooks_trained(
                embeddings, m=pq_m, ks=pq_ks, iters=pq_iters
            )
        else:
            cb = ann_mod.pq_codebooks(embeddings, m=pq_m, ks=pq_ks)
        cb.write.mode("overwrite").parquet(scratch("pq_codebooks.parquet"))
        cb = spark.read.parquet(scratch("pq_codebooks.parquet"))
        ann_mod.pq_encode(embeddings, cb, m=pq_m).write.mode(
            "overwrite"
        ).parquet(scratch("pq_codes.parquet"))
        built += ["pq_codebooks.parquet", "pq_codes.parquet"]

    row = embeddings.agg(F.max("vec_id").alias("mx")).first()
    man = {
        "kind": MANIFEST_KIND,
        "version": MANIFEST_VERSION,
        "dim": int(dim),
        "n_vectors": int(n_vec),
        "max_vec_id": int(row["mx"]),
        "n_centroids": int(n_centroids),
        "trained": bool(trained),
        "kmeans_iters": int(kmeans_iters),
        "sq8": bool(sq8),
        "pq": (
            {
                "m": int(pq_m),
                "ks": int(pq_ks),
                "trained": bool(pq_trained),
                "iters": int(pq_iters),
            }
            if pq
            else None
        ),
        "salt_target": int(salt_target),
        "source": source,
    }
    # one journaled commit: new artifacts swap in, stale artifacts +
    # the old tombstone sidecar retire, manifest LAST (commit marker —
    # the convention shared with the text index); roll-forward makes
    # the set all-or-nothing across crashes
    man_scratch = scratch("manifest.json")
    with open(man_scratch, "w") as fh:
        json.dump(man, fh, indent=2)
        fh.flush()
        os.fsync(fh.fileno())
    pairs = [(scratch(n), f"{out_dir}/{n}") for n in built]
    stale = ["tombstones.parquet"]
    if not sq8:
        stale.append("sq8.parquet")
    if not pq:
        stale += ["pq_codebooks.parquet", "pq_codes.parquet"]
    for n in stale:
        p = f"{out_dir}/{n}"
        if os.path.exists(p):
            pairs.append((p, f"{out_dir}/.retired.{uuid.uuid4().hex[:8]}.{n}"))
    pairs.append((man_scratch, f"{out_dir}/manifest.json"))
    _commit_renames(out_dir, pairs)
    _sweep_scratch(out_dir)
    _refresh_path(spark, out_dir)
    return man


@dataclass
class AnnIndex:
    """A loaded ANN store: the manifest plus lazy DataFrame handles on
    the persisted artifacts.  Frames are plain parquet scans — Spark
    prunes/pushes down as usual, nothing is collected at load time."""

    out_dir: str
    manifest: dict
    centroids: DataFrame
    assignments: DataFrame
    bucket_counts: DataFrame
    sq8: DataFrame | None
    pq_codebooks: DataFrame | None
    pq_codes: DataFrame | None
    tombstones: DataFrame | None = None

    def live_assignments(self) -> DataFrame:
        """The assignment scan with tombstoned vectors masked out by a
        broadcast anti-join — candidates are generated ONLY from this
        relation, so a deleted vector can never reach scoring through
        any serving shape (plain / sq8 / pq).  Counts stay unmasked:
        salting granularity is performance-only."""
        if self.tombstones is None:
            return self.assignments
        return self.assignments.join(
            F.broadcast(self.tombstones.select("vec_id")),
            "vec_id",
            "left_anti",
        )

    def salts(self) -> DataFrame:
        """(bucket, nsalt) from the persisted counts — centroid-count
        rows, always broadcast."""
        return bucket_salts(
            self.bucket_counts, int(self.manifest["salt_target"])
        )

    def query(
        self,
        query_vecs: DataFrame,
        embeddings: DataFrame,
        *,
        k: int = 10,
        nprobe: int = 2,
        quant: str | None = None,
        rescore_mult: int = 3,
        engine: str = "hof",
    ) -> DataFrame:
        """Serve ``(query_id, embedding)`` batches from the persisted
        artifacts: ``ivf_dense_topk`` with centroids / assignments /
        salts / quantized twins all supplied, so the plan contains NO
        per-batch prep — the corpus is touched only through the probed
        buckets (and, with ``quant``, first through the compressed twin
        columns).  ``embeddings`` is the float table the store was
        built over (the store does not duplicate the payload); result
        is bit-identical to computing the same query from scratch."""
        man = self.manifest
        if quant == "sq8" and self.sq8 is None and engine != "np":
            raise ValueError(
                f"{self.out_dir}: built without sq8 twin (sq8=False)"
            )
        if quant == "pq" and (
            self.pq_codebooks is None or self.pq_codes is None
        ):
            raise ValueError(f"{self.out_dir}: built without pq twin (pq=False)")
        pq_params = man.get("pq") or {}
        return ann_mod.ivf_dense_topk(
            query_vecs,
            embeddings,
            k=k,
            nprobe=nprobe,
            centroids=self.centroids,
            assignments=self.live_assignments(),
            salts=self.salts(),
            salt_target=int(man["salt_target"]),
            quant=quant,
            rescore_mult=rescore_mult,
            quantized=self.sq8,
            engine=engine,
            pq_m=int(pq_params.get("m", 8)),
            pq_ks=int(pq_params.get("ks", 16)),
            pq_codebooks_df=self.pq_codebooks,
            pq_codes_df=self.pq_codes,
            # manifest scalar: no per-call .first() job to derive dim
            pq_dim=int(man["dim"]),
        )


def load_ann_index(spark: SparkSession, out_dir: str) -> AnnIndex:
    """Open a store built by :func:`build_ann_index`.  A missing
    ``bucket_counts.parquet`` (a crash window of a mutation) is served
    as a lazy groupBy over the assignment scan — derivable and
    performance-only, see the build docstring.  Deliberately NOT
    rewritten here: loading is a reader path and takes no writer
    lease, so writing would race a lock-holding mutator's atomic
    counts swap; :func:`repair_ann_index` re-materializes the artifact
    under the lock."""
    man = _read_manifest(out_dir)
    counts_path = f"{out_dir}/bucket_counts.parquet"
    assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
    counts = (
        spark.read.parquet(counts_path)
        if os.path.isdir(counts_path)
        else assigns.groupBy("bucket").count()
    )

    def _opt(name: str) -> DataFrame | None:
        path = f"{out_dir}/{name}"
        return spark.read.parquet(path) if os.path.isdir(path) else None

    return AnnIndex(
        out_dir=out_dir,
        manifest=man,
        centroids=spark.read.parquet(f"{out_dir}/centroids.parquet"),
        assignments=assigns,
        bucket_counts=counts,
        sq8=_opt("sq8.parquet"),
        pq_codebooks=_opt("pq_codebooks.parquet"),
        pq_codes=_opt("pq_codes.parquet"),
        tombstones=_load_tombstones(spark, out_dir),
    )


def add_vectors(
    spark: SparkSession,
    out_dir: str,
    new_embeddings: DataFrame,
    *,
    engine: str = "np",
    skip_existing: bool = False,
) -> dict:
    """Append new vectors to a persisted store in O(batch): assign them
    to the FROZEN centroids, extend the twin tables, refresh the
    salting counts, bump the manifest.  The frozen-model contract is
    the text index's LSM one: appended vectors are served exactly as
    if they had been present at build time UNDER THE SAME centroids /
    codebooks (locked in tests); retraining models over the grown
    corpus is a rebuild, by design.

    Runs under the directory's single-writer lease lock with cache
    refreshes on entry/exit (a caller-cached scan of any artifact
    would otherwise keep serving the pre-append listing — the
    CacheManager aliasing found in round 5).  Crash safety: the twin
    tables (sq8, pq codes) append FIRST and the assignments table
    LAST — candidate generation is driven by assignments, so a crash
    between writes leaves at worst orphan twin rows that never join
    as candidates, never a vector that is a candidate but missing
    from a twin (which would silently drop it from quantized serving
    only).  Counts and manifest trail everything and are
    performance/informational only; :func:`verify_ann_index` detects
    any torn state.

    ``skip_existing=True`` silently filters out ids already present
    instead of raising — the streaming replay contract (at-least-once
    micro-batch delivery + this filter = exactly-once effect on the
    store), the ANN edition of the text updater's ``skip_stale``."""
    with _update_lock(out_dir):
        _refresh_path(spark, out_dir)
        try:
            _recover_commit(out_dir)
            _recover_swaps(out_dir)
            _sweep_scratch(out_dir)
            man = _read_manifest(out_dir)
            # pin ONE evaluation of the caller's frame: the batch feeds
            # many independent jobs below (counts, dim probe, dup
            # check, twin encodes, assignment, max-agg) and a
            # nondeterministic or concurrently-mutated input would
            # otherwise tear the append across them — exactly the
            # orphan/missing-twin corruption the healers exist for.
            # The skip_existing path pins AFTER its anti-join instead
            # (every write reads the post-filter frame; pinning twice
            # would double-materialize each streaming replay).
            if not skip_existing:
                new_embeddings = new_embeddings.localCheckpoint(eager=True)
            n_new = new_embeddings.count()
            if n_new == 0:
                return man
            dim = len(new_embeddings.select("embedding").first()["embedding"])
            if dim != int(man["dim"]):
                raise ValueError(
                    f"dim mismatch: store {man['dim']}, batch {dim}"
                )
            assigns_path = f"{out_dir}/assignments.parquet"
            existing = spark.read.parquet(assigns_path)
            skipped_tombstoned = 0
            if skip_existing:
                # ids physically present INCLUDING tombstoned ones are
                # skipped — correct for at-least-once replays, but a
                # GENUINE re-add of a deleted id is deferred until
                # compaction removes the old row; surface the count so
                # callers/stream logs can see deferred re-adds instead
                # of silently losing track of them
                tomb = _load_tombstones(spark, out_dir)
                if tomb is not None:
                    skipped_tombstoned = (
                        new_embeddings.select("vec_id")
                        .join(
                            F.broadcast(
                                tomb.select("vec_id").distinct()
                            ),
                            "vec_id",
                        )
                        .join(existing.select("vec_id"), "vec_id")
                        .count()
                    )
                new_embeddings = new_embeddings.join(
                    existing.select("vec_id"), "vec_id", "left_anti"
                ).localCheckpoint(eager=True)  # pin the filtered batch:
                # it feeds 3 write jobs below, and the anti-join must
                # not re-evaluate against a mid-append assignments scan
                n_new = new_embeddings.count()
                if n_new == 0:
                    out = dict(man)
                    if skipped_tombstoned:
                        out["skipped_tombstoned"] = int(skipped_tombstoned)
                    return out
            else:
                n_dup = (
                    new_embeddings.select("vec_id")
                    .join(existing.select("vec_id"), "vec_id")
                    .count()
                )
                if n_dup:
                    raise ValueError(
                        f"{n_dup} vec_ids already present in {out_dir} "
                        "(appends must be id-disjoint, like index merges)"
                    )
            # duplicates WITHIN the batch would append double
            # assignment/twin rows — a state verify flags forever and
            # repair cannot clear (repair only drops twin orphans);
            # reject up front (one narrow count job per mutation)
            n_distinct = new_embeddings.select("vec_id").distinct().count()
            if n_distinct != n_new:
                raise ValueError(
                    f"batch contains {n_new - n_distinct} duplicate "
                    "vec_id rows (ids must be unique within a batch)"
                )
            cent = spark.read.parquet(f"{out_dir}/centroids.parquet")
            # a retry of a crashed append would re-append twin rows the
            # crashed attempt already wrote (the id-disjoint check only
            # sees ASSIGNMENTS, which append last) — duplicate twin rows
            # would duplicate candidates in quantized serving.  Any twin
            # row whose id is in the incoming batch is necessarily such
            # an orphan (the ids are proven absent from assignments), so
            # heal by dropping them before appending fresh.
            _drop_twin_orphans(
                spark, out_dir, man, scope=new_embeddings.select("vec_id")
            )
            # twins first, assignments LAST (see docstring crash order)
            if man.get("sq8"):
                ann_mod.sq8_quantize(new_embeddings).write.mode(
                    "append"
                ).parquet(f"{out_dir}/sq8.parquet")
            if man.get("pq"):
                cb = spark.read.parquet(f"{out_dir}/pq_codebooks.parquet")
                ann_mod.pq_encode(
                    new_embeddings, cb, m=int(man["pq"]["m"])
                ).write.mode("append").parquet(f"{out_dir}/pq_codes.parquet")
            new_assigns = ann_mod.assign_buckets(
                new_embeddings, cent, engine=engine
            )
            new_assigns.write.mode("append").parquet(assigns_path)
            # counts: recompute from the appended assignments table
            # (one narrow 2-column scan) into a staging dir, then swap —
            # readers see old or new counts, never a torn write, and
            # either is exactness-safe (salting granularity only)
            _refresh_path(spark, assigns_path)
            counts_path = f"{out_dir}/bucket_counts.parquet"
            staging = f"{counts_path}.staging.{os.getpid()}"
            spark.read.parquet(assigns_path).groupBy("bucket").count().write.mode(
                "overwrite"
            ).parquet(staging)
            _replace_dir(counts_path, staging)
            row = new_embeddings.agg(F.max("vec_id").alias("mx")).first()
            man["n_vectors"] = int(man["n_vectors"]) + int(n_new)
            man["max_vec_id"] = max(int(man["max_vec_id"]), int(row["mx"]))
            _write_manifest_atomic(out_dir, man)
            out = dict(man)
            if skipped_tombstoned:
                out["skipped_tombstoned"] = int(skipped_tombstoned)
            return out
        finally:
            _refresh_path(spark, out_dir)


def _drop_twin_orphans(
    spark: SparkSession,
    out_dir: str,
    man: dict,
    scope: DataFrame | None = None,
) -> dict:
    """Drop twin rows (sq8 / pq codes) whose vec_id has no assignment
    row — the leftovers of an append that crashed between its twin
    writes and its assignments write.  Orphans are unreachable in
    serving (candidates come only from assignments) but would collide
    with a retry of the same batch.  ``scope`` narrows the check to a
    set of ids (the retry batch — a broadcast semi-join instead of a
    full anti-join against assignments); rewrites happen only when
    orphans exist, by atomic directory swap.  Caller holds the writer
    lock."""
    dropped = {}
    assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
    for flag, name in (("sq8", "sq8.parquet"), ("pq", "pq_codes.parquet")):
        if not man.get(flag):
            continue
        path = f"{out_dir}/{name}"
        if not os.path.isdir(path):
            continue
        tw = spark.read.parquet(path)
        if scope is not None:
            orphan_ids = tw.select("vec_id").join(
                F.broadcast(scope.select("vec_id").distinct()), "vec_id"
            )
        else:
            orphan_ids = (
                tw.select("vec_id")
                .distinct()
                .join(assigns.select("vec_id"), "vec_id", "left_anti")
            )
        n = orphan_ids.distinct().count()
        if n == 0:
            continue
        keep = tw.join(
            F.broadcast(orphan_ids.distinct()), "vec_id", "left_anti"
        )
        staging = f"{path}.staging.{os.getpid()}"
        keep.write.mode("overwrite").parquet(staging)
        _replace_dir(path, staging)
        _refresh_path(spark, path)
        dropped[flag] = int(n)
    return dropped


def _heal_missing_twin_rows(
    spark: SparkSession, out_dir: str, man: dict
) -> dict:
    """The inverse crash window of :func:`_drop_twin_orphans`: a
    compaction that rewrote a twin (dropping tombstoned rows) but
    crashed before rewriting assignments leaves assigned ids with NO
    twin row.  Serving stays exact (the sidecar still masks those
    ids), but the twin coverage checks of :func:`verify_ann_index`
    fail and orphan-dropping alone can never clear them.  Heal order
    of preference: (1) missing ids all tombstoned — exactly that
    window — roll the interrupted compaction FORWARD
    (:func:`_compact_locked`); (2) otherwise re-derive the missing
    rows from the manifest's ``source`` embeddings table when it is
    readable and covers them; (3) otherwise amputate the twin (drop
    the dir, clear the manifest flag) — a twin is a derivable
    acceleration, and the store serves exactly without it.  Caller
    holds the writer lock and owns the manifest write (``man`` is
    mutated in place on amputation)."""
    notes: dict = {}
    assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
    tomb = _load_tombstones(spark, out_dir)
    for flag, name in (("sq8", "sq8.parquet"), ("pq", "pq_codes.parquet")):
        if not man.get(flag):
            continue
        path = f"{out_dir}/{name}"
        have = (
            spark.read.parquet(path).select("vec_id").distinct()
            if os.path.isdir(path)
            else spark.createDataFrame([], "vec_id long")
        )
        missing = (
            assigns.select("vec_id").distinct().join(have, "vec_id", "left_anti")
        )
        n_missing = missing.count()
        if n_missing == 0:
            continue
        if (
            tomb is not None
            and missing.join(
                F.broadcast(tomb.select("vec_id").distinct()),
                "vec_id",
                "left_anti",
            ).count()
            == 0
        ):
            _compact_locked(spark, out_dir)
            notes["compaction_rolled_forward"] = True
            return notes  # the fold healed every twin at once
        healed = False
        src = man.get("source")
        if src is not None:
            try:
                embs = spark.read.parquet(src).join(
                    F.broadcast(missing), "vec_id"
                )
                if embs.count() == n_missing:
                    if flag == "sq8":
                        ann_mod.sq8_quantize(embs).write.mode(
                            "append"
                        ).parquet(path)
                    else:
                        cb = spark.read.parquet(
                            f"{out_dir}/pq_codebooks.parquet"
                        )
                        ann_mod.pq_encode(
                            embs, cb, m=int(man["pq"]["m"])
                        ).write.mode("append").parquet(path)
                    _refresh_path(spark, path)
                    notes[flag] = {"rederived": int(n_missing)}
                    healed = True
            except Exception:
                healed = False
        if not healed:
            _remove_dir(path)
            if flag == "sq8":
                man["sq8"] = False
            else:
                _remove_dir(f"{out_dir}/pq_codebooks.parquet")
                man["pq"] = None
            notes[flag] = {"amputated": int(n_missing)}
    return notes


def repair_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Re-derive every derivable artifact from the tables of record —
    the universal healer for any mutation crash window
    (:func:`verify_ann_index` flags them; this clears them).  Drops
    twin rows with no assignment row (crashed-append orphans), heals
    twins MISSING rows for assigned ids (the interrupted-compaction
    window — rolled forward via :func:`_heal_missing_twin_rows`, which
    falls back to re-deriving from the manifest source or amputating
    the twin), prunes tombstones that no longer reference an
    assignment row (crashed compaction tail), recomputes
    ``bucket_counts`` and the manifest accounting (``n_vectors``,
    ``max_vec_id``, ``n_tombstones``) from the assignments table.
    Centroids / codebooks / layout params are NEVER touched — they are
    models, not accounting.  Serving is exact before and after (every
    torn state this repairs is already exactness-safe); the point is
    restoring the invariants so appends and verify behave."""
    with _update_lock(out_dir):
        _refresh_path(spark, out_dir)
        try:
            _recover_commit(out_dir)
            _recover_swaps(out_dir)
            _sweep_scratch(out_dir)
            man = _read_manifest(out_dir)
            dropped = _drop_twin_orphans(spark, out_dir, man)
            twin_heal = _heal_missing_twin_rows(spark, out_dir, man)
            if twin_heal.get("compaction_rolled_forward"):
                # the roll-forward IS the compaction tail — counts,
                # manifest accounting and sidecar retirement are
                # already done; redoing the accounting pass below
                # would just repeat the same scans and writes
                man = _read_manifest(out_dir)
                return {
                    "orphan_twin_ids_dropped": dropped,
                    "twin_heal": twin_heal,
                    "n_vectors": int(man["n_vectors"]),
                    "n_tombstones": 0,
                }
            assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
            tomb = _load_tombstones(spark, out_dir)
            n_tomb = 0
            if tomb is not None:
                live = tomb.select("vec_id").distinct().join(
                    assigns.select("vec_id"), "vec_id"
                )
                n_tomb = live.count()
                tomb_path = f"{out_dir}/tombstones.parquet"
                if n_tomb == 0:
                    # every tombstone references a removed row (crashed
                    # compaction tail) — retire the sidecar outright
                    _remove_dir(tomb_path)
                elif n_tomb != tomb.count():
                    _write_tombstones_file(
                        out_dir, [r["vec_id"] for r in live.collect()]
                    )
                    _refresh_path(spark, tomb_path)
            counts_path = f"{out_dir}/bucket_counts.parquet"
            staging = f"{counts_path}.staging.{os.getpid()}"
            assigns.groupBy("bucket").count().write.mode(
                "overwrite"
            ).parquet(staging)
            _replace_dir(counts_path, staging)
            row = assigns.agg(
                F.count("*").alias("n"), F.max("vec_id").alias("mx")
            ).first()
            man["n_vectors"] = int(row["n"])
            man["max_vec_id"] = int(row["mx"])
            if n_tomb:
                man["n_tombstones"] = int(n_tomb)
            else:
                man.pop("n_tombstones", None)
            _write_manifest_atomic(out_dir, man)
            return {
                "orphan_twin_ids_dropped": dropped,
                "twin_heal": twin_heal,
                "n_vectors": int(row["n"]),
                "n_tombstones": int(n_tomb),
            }
        finally:
            _refresh_path(spark, out_dir)


def delete_vectors(spark: SparkSession, out_dir: str, vec_ids) -> dict:
    """Tombstone ``vec_ids`` in the store at ``out_dir`` — O(tombstones),
    no artifact rewrite: queries mask the assignment scan from the
    sidecar immediately (:meth:`AnnIndex.live_assignments`), exactly the
    text index's deletion contract (checkpoint.delete_docs).  Ids not
    present in the store are ignored (they cannot become candidates);
    re-deleting is a no-op union.  A tombstoned id stays physically
    present until :func:`compact_ann_index`, so re-adding it is rejected
    by :func:`add_vectors` until then (same as the text index).

    Single-writer locked with cache refreshes on entry/exit (the
    CacheManager path-aliasing rule); the sidecar is replaced by an
    atomic directory swap, so readers see the old or new tombstone set,
    never a torn one.  Manifest (``n_tombstones``) trails as the
    accounting :func:`verify_ann_index` cross-checks."""
    with _update_lock(out_dir):
        _refresh_path(spark, out_dir)
        try:
            _recover_commit(out_dir)
            _recover_swaps(out_dir)
            _sweep_scratch(out_dir)
            man = _read_manifest(out_dir)
            req = sorted({int(v) for v in vec_ids})
            prev = _load_tombstones(spark, out_dir)
            n_prev = 0 if prev is None else prev.count()
            if not req:
                return {
                    "requested": 0,
                    "ignored_absent": 0,
                    "tombstones_total": n_prev,
                    "previously": n_prev,
                }
            req_df = spark.createDataFrame(
                [(v,) for v in req], "vec_id long"
            )
            assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
            present = req_df.join(assigns.select("vec_id"), "vec_id")
            merged = (
                present
                if prev is None
                else prev.select("vec_id").unionByName(present).distinct()
            )
            # the sidecar is the table of RECORD for deletions: one
            # atomic single-file replace (no directory swap, no absent
            # window, no aside whose loss could resurrect vectors)
            merged_ids = [r["vec_id"] for r in merged.collect()]
            n_total = _write_tombstones_file(out_dir, merged_ids)
            _refresh_path(spark, f"{out_dir}/tombstones.parquet")
            man["n_tombstones"] = int(n_total)
            _write_manifest_atomic(out_dir, man)
            return {
                "requested": len(req),
                "ignored_absent": len(req) - present.count(),
                "tombstones_total": int(n_total),
                "previously": int(n_prev),
            }
        finally:
            _refresh_path(spark, out_dir)


def compact_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Fold the tombstones physically: drop the deleted rows from the
    twin tables and the assignments, recompute the salting counts and
    the manifest accounting over the survivors, retire the sidecar —
    after which the deleted ids may be re-added.  Centroids and PQ
    codebooks stay FROZEN (models are retrained only by a rebuild), so
    a compacted store serves bit-identically to the masked store it
    replaces — the same guarantee the text index's compact_index gives
    and the invariant the tests pin.

    Crash safety mirrors the append: twins rewrite first, assignments
    last, each by atomic directory swap; the sidecar keeps masking
    throughout (masking an already-removed id is a no-op), the manifest
    is the commit marker, and the sidecar retires after it.  A crash in
    any window leaves serving exact and is healed by re-running
    compaction (:func:`verify_ann_index` flags the torn accounting)."""
    with _update_lock(out_dir):
        _refresh_path(spark, out_dir)
        try:
            _recover_commit(out_dir)
            _recover_swaps(out_dir)
            _sweep_scratch(out_dir)
            return _compact_locked(spark, out_dir)
        finally:
            _refresh_path(spark, out_dir)


def _compact_locked(spark: SparkSession, out_dir: str) -> dict:
    """Compaction body; caller holds the writer lock.  Also the
    roll-forward :func:`repair_ann_index` uses when it detects the
    interrupted-compaction crash window (twin already folded,
    assignments not yet)."""
    man = _read_manifest(out_dir)
    tomb = _load_tombstones(spark, out_dir)
    if tomb is None:
        return {"removed": 0, "n_vectors": int(man["n_vectors"])}
    tomb_ids = F.broadcast(tomb.select("vec_id"))
    assigns_path = f"{out_dir}/assignments.parquet"
    n_before = spark.read.parquet(assigns_path).count()
    n_dead = (
        spark.read.parquet(assigns_path).join(tomb_ids, "vec_id").count()
    )
    if n_dead == n_before:
        raise ValueError(
            f"{out_dir}: compaction would remove every vector; "
            "rebuild instead"
        )

    def _rewrite(name: str) -> None:
        path = f"{out_dir}/{name}"
        if not os.path.isdir(path):
            return
        staging = f"{path}.staging.{os.getpid()}"
        spark.read.parquet(path).join(
            tomb_ids, "vec_id", "left_anti"
        ).write.mode("overwrite").parquet(staging)
        _replace_dir(path, staging)
        _refresh_path(spark, path)

    _rewrite("sq8.parquet")
    _rewrite("pq_codes.parquet")
    _rewrite("assignments.parquet")
    survivors = spark.read.parquet(assigns_path)
    counts_path = f"{out_dir}/bucket_counts.parquet"
    staging = f"{counts_path}.staging.{os.getpid()}"
    survivors.groupBy("bucket").count().write.mode("overwrite").parquet(
        staging
    )
    _replace_dir(counts_path, staging)
    row = survivors.agg(
        F.count("*").alias("n"), F.max("vec_id").alias("mx")
    ).first()
    man["n_vectors"] = int(row["n"])
    man["max_vec_id"] = int(row["mx"])
    man.pop("n_tombstones", None)
    _write_manifest_atomic(out_dir, man)
    # retire the sidecar: atomic rename out of the readers' path, then
    # best-effort removal of the renamed dir
    _remove_dir(f"{out_dir}/tombstones.parquet")
    return {"removed": int(n_dead), "n_vectors": int(row["n"])}


def neardup_via_store(
    spark: SparkSession,
    store_dir: str,
    embeddings: DataFrame,
    threshold: float | None = None,
    salt_target: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs served from the persisted store — the
    amortized twin of ``dedup.embedding_neardup_bucketed``: the frozen
    centroids + assignments replace the per-call k-means AND the
    n x n_centroids argmax pass (the two corpus-sized prep stages), so
    a dedup refresh costs only the radii derivation + the pruned
    bucket joins.  Tombstoned vectors are masked (candidates come from
    live assignments only), and the triangle-inequality pruning stays
    complete under frozen-model appends (the bound needs only each
    vector's angle to its OWN bucket centroid — any assignment works).
    Output equals the brute-force pair relation over the LIVE vectors
    exactly."""
    from partitioned_ef_ans_spark.operators import dedup as d_mod

    idx = load_ann_index(spark, store_dir)
    kw = {} if threshold is None else {"threshold": float(threshold)}
    return d_mod.embedding_neardup_bucketed(
        embeddings,
        centroids=idx.centroids,
        assignments=idx.live_assignments(),
        salt_target=(
            int(idx.manifest["salt_target"])
            if salt_target is None
            else salt_target
        ),
        **kw,
    )


def query_sharded_ann(
    spark: SparkSession,
    store_dirs: list[str],
    query_vecs: DataFrame,
    embeddings: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    quant: str | None = None,
    rescore_mult: int = 3,
    engine: str = "hof",
) -> DataFrame:
    """Scatter-gather serving over N independent ANN stores — the
    dense analogue of the text plane's sharded serving
    (index/sharded.py): every store serves its own per-query top-k
    from its own centroids/assignments/tombstones, the k-lists union,
    and a global re-rank by ``(cos desc, doc_id)`` keeps the best k.

    Unlike sharded BM25 there is NO global statistic to reconcile —
    cosine is a per-pair value, identical no matter which shard holds
    the vector — so the gather is exact by construction: with
    ``nprobe`` covering every store's centroids the result equals
    brute force over the union of the shards' live vectors, and at
    any ``nprobe`` it equals per-shard IVF + exact fusion (the
    relation the gate's textual oracle replays).  Scale shape: each
    shard's plan is its own store's serving plan unchanged; the
    gather is O(queries × k × shards) rows — tiny, one extra window.

    ``embeddings`` is the shared float payload table the stores sit
    beside (per-shard candidate joins touch only that shard's ids)."""
    from pyspark.sql import Window

    if not store_dirs:
        raise ValueError("query_sharded_ann: no store directories")
    legs = [
        load_ann_index(spark, d).query(
            query_vecs,
            embeddings,
            k=k,
            nprobe=nprobe,
            quant=quant,
            rescore_mult=rescore_mult,
            engine=engine,
        )
        for d in store_dirs
    ]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    # overlapping shards (e.g. a merged-but-not-yet-retired source) may
    # surface the same vector from two legs with the identical per-pair
    # cos — dedup before ranking so a duplicate can never occupy two
    # top-k slots and displace a genuine neighbor
    return (
        u.select("query_id", "doc_id", "cos")
        .dropDuplicates(["query_id", "doc_id"])
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cos")
    )


def merge_ann_stores(
    spark: SparkSession,
    dst_dir: str,
    src_dirs: list[str],
    embeddings: DataFrame,
    *,
    engine: str = "np",
) -> dict:
    """Fold the LIVE vectors of the ``src_dirs`` stores into the store
    at ``dst_dir`` — the ANN analogue of the text plane's shard merge
    (checkpoint.merge_indexes), at append cost: ids come from each
    source's assignments minus its tombstones (deleted vectors never
    migrate), payloads from the shared ``embeddings`` table, and the
    whole union lands as ONE :func:`add_vectors` batch under the
    destination's FROZEN centroids.  O(source vectors); the
    destination is never re-read or re-assigned.

    Id-disjointness is enforced by ``add_vectors`` (vs the
    destination AND within the union via the intra-batch duplicate
    check, so overlapping sources fail loudly).  The merged store
    serves the source vectors exactly as if they had been appended
    directly — same frozen-model contract, same bit-equal serving.
    Sources are left untouched (retire them once the merge returns)."""
    if not src_dirs:
        raise ValueError("merge_ann_stores: no source stores")
    ids = None
    for src in src_dirs:
        live = load_ann_index(spark, src).live_assignments().select("vec_id")
        ids = live if ids is None else ids.unionByName(live)
    # pin ONE consistent snapshot of the sources: the lazy plans below
    # would otherwise re-scan the live source dirs once per downstream
    # job (counts, dim probe, dup check, twin encodes, assignment,
    # max-agg inside add_vectors) and a concurrent mutation of a
    # source — sources take no lock here — could tear the batch across
    # jobs (the same reason add_vectors pins its skip_existing filter)
    ids = ids.localCheckpoint(eager=True)
    batch = embeddings.join(ids, "vec_id").localCheckpoint(eager=True)
    n_ids = ids.count()
    n_batch = batch.count()
    if n_batch != n_ids:
        raise ValueError(
            f"embeddings table covers {n_batch}/{n_ids} live source "
            "vectors — merge needs the shared payload table the "
            "sources were built over"
        )
    return add_vectors(spark, dst_dir, batch, engine=engine)


def snapshot_ann_index(
    out_dir: str, dest: str | None = None, timeout: float = 120.0
) -> str:
    """Reader-pinned snapshot of an ANN store (hardlink tree), served
    exactly like the live dir by :func:`load_ann_index`.  Delegates to
    checkpoint.snapshot_index — its consistency protocol (no writer
    lease on either side of the walk + manifest file identity
    unchanged) transfers verbatim because every store mutator holds
    the SAME lease for its whole duration and commits via the same
    manifest-last atomic replace.  Release with
    checkpoint.release_snapshot."""
    from partitioned_ef_ans_spark.index.checkpoint import snapshot_index

    _read_manifest(out_dir)  # fail fast on a non-ANN directory
    return snapshot_index(out_dir, dest, timeout)


#: verify advisory threshold: tombstones / assignments above this flags
#: broadcast-mask growth and points at compaction (masking stays exact
#: at any ratio — this is operational pressure, not correctness)
TOMBSTONE_PRESSURE_RATIO = float(
    os.environ.get("PEFA_TOMBSTONE_PRESSURE_RATIO", "0.05")
)


def verify_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Row-accounting invariants across the artifact tables (the ANN
    analogue of the text index's verification pass): assignment rows ==
    manifest n_vectors == distinct vec_ids; the sq8 twin covers exactly
    the assigned ids; pq codes are exactly m rows per assigned id.
    Returns ``{"ok": bool, "checks": {...}}``."""
    man = _read_manifest(out_dir)
    _refresh_path(spark, out_dir)
    assigns = spark.read.parquet(f"{out_dir}/assignments.parquet")
    n_rows = assigns.count()
    a_ids = assigns.select("vec_id").distinct()
    n_ids = a_ids.count()
    checks = {
        "assignment_rows": n_rows == int(man["n_vectors"]),
        "assignment_ids_distinct": n_ids == n_rows,
    }
    if man.get("sq8"):
        q8_path = f"{out_dir}/sq8.parquet"
        if not os.path.isdir(q8_path):
            # manifest flags a twin whose dir is gone (e.g. a crashed
            # amputation) — a failed CHECK, not a crash of the checker
            checks["sq8_present"] = False
        else:
            q8 = spark.read.parquet(q8_path)
            q8_ids = q8.select("vec_id").distinct()
            # distinct-id set equality BOTH ways plus no duplicate
            # rows: a duplicated row must not mask a missing id (the
            # old count==count check let exactly that through)
            checks["sq8_rows_distinct"] = q8_ids.count() == q8.count()
            checks["sq8_covers_assigned"] = (
                a_ids.join(q8_ids, "vec_id", "left_anti").count() == 0
            )
            checks["sq8_no_orphans"] = (
                q8_ids.join(a_ids, "vec_id", "left_anti").count() == 0
            )
    if man.get("pq"):
        codes_path = f"{out_dir}/pq_codes.parquet"
        if not os.path.isdir(codes_path) or not os.path.isdir(
            f"{out_dir}/pq_codebooks.parquet"
        ):
            checks["pq_present"] = False
        else:
            codes = spark.read.parquet(codes_path)
            m = int(man["pq"]["m"])
            per_id = codes.groupBy("vec_id").count()
            # exactly m rows per ASSIGNED id, none for unassigned ids
            checks["pq_m_rows_per_id"] = (
                per_id.where(F.col("count") != m).count() == 0
            )
            checks["pq_covers_assigned"] = (
                a_ids.join(
                    per_id.select("vec_id"), "vec_id", "left_anti"
                ).count()
                == 0
            )
            checks["pq_no_orphans"] = (
                per_id.select("vec_id").join(
                    a_ids, "vec_id", "left_anti"
                ).count()
                == 0
            )
            # duplicated subspace rows + a missing subspace can hide
            # inside "m rows per id" — distinct (vec_id, s) must equal
            # the row count (with m-per-id this forces all m subspaces)
            checks["pq_subspace_rows_distinct"] = (
                codes.select("vec_id", "s").distinct().count()
                == codes.count()
            )
    tomb = _load_tombstones(spark, out_dir)
    if tomb is not None or man.get("n_tombstones"):
        n_tomb = 0 if tomb is None else tomb.count()
        checks["tombstones_distinct"] = tomb is None or (
            tomb.select("vec_id").distinct().count() == n_tomb
        )
        # manifest/sidecar accounting agrees (a mismatch marks the
        # crash window of a delete or compaction — serving stays exact
        # either way; re-running compaction heals it)
        checks["tombstones_accounted"] = n_tomb == int(
            man.get("n_tombstones", 0)
        )
    out = {"ok": all(checks.values()), "checks": checks}
    # tombstone-pressure advisory (NOT a failed check — masking stays
    # exact at any ratio): the query-time mask is a BROADCAST anti-join
    # by design, so a delete-heavy store that never compacts grows the
    # broadcast without bound.  Report the ratio and flag past the
    # threshold, pointing at compaction (measured ~1.3 s).
    n_tomb_live = tomb.count() if tomb is not None else int(
        man.get("n_tombstones", 0)
    )
    ratio = n_tomb_live / max(n_rows, 1)
    out["tombstone_ratio"] = round(ratio, 6)
    if ratio > TOMBSTONE_PRESSURE_RATIO:
        out["tombstone_pressure"] = (
            f"{n_tomb_live} tombstones over {n_rows} assignments "
            f"({ratio:.1%} > {TOMBSTONE_PRESSURE_RATIO:.0%}): the "
            "broadcast mask is growing — run compact_ann_index"
        )
    return out
