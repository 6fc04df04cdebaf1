"""SnapshotTable: Iceberg-style commits, time travel, isolation, expiry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.sources import snapshots as snapmod
from python_vegindex_spark.sources.snapshots import (
    CommitConflict,
    InMemoryManifestIO,
    S3ManifestIO,
    SnapshotTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, day string, v double")


class FakeS3Client:
    """boto3-S3-shaped fake: a locked dict honoring conditional PUT
    (``IfNoneMatch='*'``), raising REAL ``botocore`` ``ClientError``s,
    with an injectable fault schedule — ``faults[op]`` is a list of
    error codes raised (and consumed) before the op is allowed through,
    so tests drive exact transient/conflict sequences."""

    def __init__(self, faults: dict | None = None):
        import threading

        self._lock = threading.Lock()
        self._objs: dict[str, tuple[bytes, float]] = {}
        self.faults = faults or {}
        self.calls: list[str] = []

    def _maybe_fault(self, op: str):
        from botocore.exceptions import ClientError

        self.calls.append(op)
        sched = self.faults.get(op)
        if sched:
            code = sched.pop(0)
            if code is not None:
                raise ClientError(
                    {"Error": {"Code": code, "Message": f"injected {code}"}},
                    op,
                )

    @staticmethod
    def _err(code: str, op: str):
        from botocore.exceptions import ClientError

        return ClientError(
            {"Error": {"Code": code, "Message": code}}, op
        )

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        import time as _time

        self._maybe_fault("put_object")
        data = Body if isinstance(Body, bytes) else Body.encode()
        with self._lock:
            if IfNoneMatch == "*" and Key in self._objs:
                raise self._err("PreconditionFailed", "PutObject")
            self._objs[Key] = (data, _time.time())
        return {}

    def get_object(self, Bucket, Key, **kw):
        import io

        self._maybe_fault("get_object")
        with self._lock:
            if Key not in self._objs:
                raise self._err("NoSuchKey", "GetObject")
            return {"Body": io.BytesIO(self._objs[Key][0])}

    def head_object(self, Bucket, Key, **kw):
        self._maybe_fault("head_object")
        with self._lock:
            if Key not in self._objs:
                raise self._err("404", "HeadObject")
            return {"LastModified": self._objs[Key][1]}

    def list_objects_v2(self, Bucket, Prefix="", Delimiter=None, **kw):
        self._maybe_fault("list_objects_v2")
        with self._lock:
            keys = sorted(
                k
                for k in self._objs
                if k.startswith(Prefix)
                and (Delimiter is None or Delimiter not in k[len(Prefix):])
            )
        return {
            "Contents": [{"Key": k} for k in keys],
            "IsTruncated": False,
        }

    def delete_object(self, Bucket, Key, **kw):
        self._maybe_fault("delete_object")
        with self._lock:
            self._objs.pop(Key, None)  # S3 delete is idempotent
        return {}


def _s3_io(client=None, **kw):
    kw.setdefault("sleep_fn", lambda s: None)  # no wall-clock in tests
    return S3ManifestIO("test-bucket", client=client or FakeS3Client(), **kw)


@pytest.fixture(params=["localfs", "memory", "s3"], autouse=True)
def manifest_backend(request, monkeypatch):
    """Round-4/5: the WHOLE suite runs three times — local FS, the
    in-memory conditional-put mock, and the real S3 backend driven
    against a boto3-shaped fake — proving the commit protocol only
    touches storage through the ManifestIO seam."""
    if request.param in ("memory", "s3"):
        stores: dict[str, object] = {}
        real_init = SnapshotTable.__init__

        def make_io():
            return (
                InMemoryManifestIO()
                if request.param == "memory"
                else _s3_io()
            )

        def patched(self, spark, root, *a, **kw):
            # handles of the same root share one store, like a bucket
            kw.setdefault("io", stores.setdefault(root, make_io()))
            real_init(self, spark, root, *a, **kw)

        monkeypatch.setattr(snapmod.SnapshotTable, "__init__", patched)
    return request.param


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_append_and_time_travel(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    assert t.read() is None
    v1 = t.append(_mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    v2 = t.append(_mk(spark, [(3, "b", 3.0)]))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 3
    assert t.read(version=1).count() == 2
    assert sorted(r["id"] for r in t.read(version=2).collect()) == [1, 2, 3]
    hist = t.history()
    assert [h["version"] for h in hist] == [1, 2]
    assert [h["operation"] for h in hist] == ["append", "append"]
    assert hist[-1]["total_rows"] == 3


def test_upsert_copy_on_write_scope(spark, root):
    """Only file groups intersecting the update's partitions are
    rewritten; others carry over by reference (same group id)."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    t.append(_mk(spark, [(3, "b", 3.0), (4, "b", 4.0)]))
    g_b = [g for g in t._manifest(2)["files"] if ["b"] in g["partitions"]]
    assert len(g_b) == 1

    # partition-scoped COW needs partition_by ⊆ keys (else a key could
    # move partitions and the scope would be unsound — see the
    # partition-moving regression test)
    t.upsert(_mk(spark, [(2, "a", 20.0), (5, "a", 5.0)]), keys=["id", "day"])
    m3 = t._manifest(3)
    # the day=b group is carried over untouched, the day=a group replaced
    assert g_b[0]["group"] in {g["group"] for g in m3["files"]}
    assert m3["summary"]["groups_removed"] == 1
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0, 4: 4.0, 5: 5.0}
    # time travel still sees the pre-merge value
    old = {r["id"]: r["v"] for r in t.read(version=2).collect()}
    assert old[2] == 2.0 and 5 not in old


def test_snapshot_isolation_under_upsert(spark, root):
    """A reader that planned before a concurrent MERGE keeps reading the
    old snapshot — the property tableio's in-place rewrite cannot give."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    reader = t.read()  # lazy plan pinned to v1's file list
    t.upsert(_mk(spark, [(1, "a", 100.0)]), keys=["id"])
    t.expire_snapshots(keep_last=2, grace_s=0.0)  # v1 still retained
    assert {r["v"] for r in reader.collect()} == {1.0, 2.0}


def test_commit_conflict_first_writer_wins(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0)]))
    # simulate a racing writer: same parent, same target version
    files = list(t._manifest(1)["files"])
    t._commit(1, files, "append", _mk(spark, []).schema.json(), {})
    with pytest.raises(CommitConflict):
        t._commit(1, files, "append", _mk(spark, []).schema.json(), {})
    # retry on the new state succeeds
    assert t._commit(t.current_version(), files, "append",
                     _mk(spark, []).schema.json(), {}) == 3


def test_prune_reads_fewer_groups_same_answer(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    t.append(_mk(spark, [(3, "b", 3.0)]))
    t.append(_mk(spark, [(4, "c", 4.0)]))
    m = t._manifest(t.current_version())
    pruned = t._select_groups(m, {"day": ["b"]})
    assert len(pruned) == 1 and len(m["files"]) == 3
    got = t.read(prune={"day": ["b"]}).collect()
    assert [(r["id"], r["v"]) for r in got] == [(3, 3.0)]
    # prune + row filter equivalence on a mixed-partition group
    t.append(_mk(spark, [(5, "a", 5.0), (6, "b", 6.0)]))
    via_prune = sorted(r["id"] for r in t.read(prune={"day": ["b"]}).collect())
    via_filter = sorted(
        r["id"] for r in t.read().filter(F.col("day") == "b").collect()
    )
    assert via_prune == via_filter == [3, 6]


def test_rollback_is_metadata_only(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0)]))
    t.overwrite(_mk(spark, [(9, "z", 9.0)]))
    v3 = t.rollback(1)
    assert v3 == 3
    assert [r["id"] for r in t.read().collect()] == [1]
    # nothing deleted: v2 still time-travels
    assert [r["id"] for r in t.read(version=2).collect()] == [9]
    assert t._manifest(3)["files"] == t._manifest(1)["files"]


def test_compact_folds_groups(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    for i in range(4):
        t.append(_mk(spark, [(i, "a", float(i))]))
    v = t.compact(target_rows_per_file=100)
    m = t._manifest(v)
    assert len(m["files"]) == 1 and m["operation"] == "compact"
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3]


def test_expire_snapshots_gc(spark, root):
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0)]))
    t.overwrite(_mk(spark, [(2, "b", 2.0)]))
    t.overwrite(_mk(spark, [(3, "c", 3.0)]))
    datadir = os.path.join(root, "data")
    assert len(os.listdir(datadir)) == 3
    out = t.expire_snapshots(keep_last=1, grace_s=0.0)
    assert out["expired_snapshots"] == 2 and out["removed_groups"] == 2
    assert [r["id"] for r in t.read().collect()] == [3]
    with pytest.raises(KeyError):
        t.read(version=1)


def test_unpartitioned_table(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_mk(spark, [(1, "a", 1.0)]))
    t.upsert(_mk(spark, [(1, "a", 10.0), (2, "b", 2.0)]), keys=["id"])
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: 10.0, 2: 2.0}
    with pytest.raises(ValueError):
        t.read(prune={"day": ["a"]})


def test_incremental_store_on_snapshots(spark, tmp_path):
    """RollupStore(snapshots=True): the increments ≡ full-recompute
    invariant holds unchanged, each run is one commit with time travel
    to the pre-run gold, and a bad run rolls back metadata-only."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.operators.features import turn_features
    from python_vegindex_spark.operators.rollup import rollup
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.incremental import (
        RollupStore,
        incremental_rollup,
    )

    turns = synth_turns(spark, n_convs=30, seed=13, span_days=90).cache()
    cfg = RollupConfig(tier="daily", nmin=2)
    store = RollupStore(str(tmp_path / "snapstore"), snapshots=True)

    m1 = incremental_rollup(spark, turns.filter(F.col("ts") < "2024-02-01"), store, cfg)
    m2 = incremental_rollup(spark, turns, store, cfg)
    assert m1["rows_in"] > 0 and m2["rows_in"] > 0

    def _norm(pdf):
        return (
            pdf.sort_values(["conv_id", "bucket_start"], kind="stable")
            .reset_index(drop=True)
            .sort_index(axis=1)
        )

    got = _norm(store.read_gold(spark, "daily").toPandas())
    exp = _norm(rollup(turn_features(turns), cfg).toPandas())
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_exact=False, rtol=1e-12)

    t = store.gold_snapshot(spark, "daily")
    hist = t.history()
    assert [h["operation"] for h in hist] == ["append", "upsert"]
    # time travel: v1 is exactly run-1's gold
    exp1 = _norm(
        rollup(turn_features(turns.filter(F.col("ts") < "2024-02-01")), cfg).toPandas()
    )
    got1 = _norm(t.read(version=1).toPandas())
    pd.testing.assert_frame_equal(got1, exp1[got1.columns.tolist()], check_exact=False, rtol=1e-12)
    # run 2's COW carried some of run 1's untouched file groups by reference
    assert hist[-1]["summary"].get("groups_carried", 0) >= 0

    # a bad commit is undone without data movement
    t.rollback(1)
    got_rb = _norm(store.read_gold(spark, "daily").toPandas())
    pd.testing.assert_frame_equal(got_rb, exp1[got_rb.columns.tolist()], check_exact=False, rtol=1e-12)


def test_incremental_job_cli_snapshots(spark, tmp_path, manifest_backend):
    """incremental_job.py --snapshots end-to-end: two runs commit two
    snapshot versions; --history lists them; --rollback restores run 1's
    gold; --expire prunes to the newest snapshots."""
    if manifest_backend in ("memory", "s3"):
        pytest.skip("drives a separate subprocess — an injected "
                    "in-process backend cannot cross the process boundary")
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.operators.features import turn_features
    from python_vegindex_spark.operators.rollup import rollup
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.incremental import RollupStore

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    turns = synth_turns(spark, n_convs=20, seed=5, span_days=60)
    early = turns.filter(F.col("ts") < "2024-01-20")
    p_all, p_early = str(tmp_path / "turns"), str(tmp_path / "early")
    turns.write.parquet(p_all)
    early.write.parquet(p_early)
    store_dir = str(tmp_path / "store")

    def run(extra):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "incremental_job.py"),
             "--store", store_dir, "--tiers", "daily", "--snapshots", *extra],
            capture_output=True, text=True, timeout=420,
        )
        lines = [l for l in out.stdout.splitlines()
                 if l.startswith("INCREMENTAL_METRICS ")]
        assert lines, out.stdout[-1500:] + out.stderr[-2500:]
        return json.loads(lines[0][len("INCREMENTAL_METRICS "):])

    m1 = run(["--turns", p_early])
    m2 = run(["--turns", p_all])
    assert m1["mode"] == m2["mode"] == "incremental"

    h = run(["--turns", p_all, "--history", "daily"])
    assert [c["operation"] for c in h["history"]] == ["append", "upsert"]

    rb = run(["--turns", p_all, "--rollback", "daily:1"])
    assert rb["new_version"] == 3
    store = RollupStore(store_dir, snapshots=True)
    got = store.read_gold(spark, "daily").toPandas()
    exp = rollup(turn_features(early), RollupConfig(tier="daily", nmin=2)).toPandas()
    assert len(got) == len(exp)

    ex = run(["--turns", p_all, "--expire", "daily:1"])
    assert ex["expired_snapshots"] == 2 and ex["retained"] == [3]
    assert store.read_gold(spark, "daily").count() == len(exp)

    z = run(["--turns", p_all, "--zorder", "daily:bucket_start,turn_count",
             "--zorder-target-rows", "5"])
    assert z["mode"] == "zorder" and z["zorder_by"] == ["bucket_start", "turn_count"]
    assert z["new_version"] == 4 and z["n_groups"] >= 2
    # the rewrite records zone maps on the z-ordered columns — without
    # them the mode would be a silent pruning no-op
    assert z["groups_with_zone_maps"] == z["n_groups"]
    assert store.read_gold(spark, "daily").count() == len(exp)
    snap = store.gold_snapshot(spark, "daily", stats_cols=["bucket_start", "turn_count"])
    box = {"turn_count": (2, 5)}
    # pruned read ≡ plain filter (pruning effectiveness itself is pinned
    # by test_zorder_compact_prunes_multi_dim_boxes at a larger scale)
    assert (
        snap.read(prune_range=box).count()
        == store.read_gold(spark, "daily").filter(F.col("turn_count").between(2, 5)).count()
    )


def test_schema_evolution_add_column(spark, root):
    """Iceberg add-column semantics: an append with a new column evolves
    the table schema; old files read as NULL for it; time travel keeps
    v1's own narrower schema; a MERGE carrying the new column NULL-fills
    kept rows."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    widened = spark.createDataFrame(
        [(3, "c", 3.0, "en")], "id long, day string, v double, lang string"
    )
    t.append(widened)
    cur = t.read()
    assert cur.columns == ["id", "day", "v", "lang"]
    got = {r["id"]: r["lang"] for r in cur.collect()}
    assert got == {1: None, 2: None, 3: "en"}
    # time travel: v1 keeps its own schema
    assert t.read(version=1).columns == ["id", "day", "v"]

    # schema-evolving MERGE: kept rows NULL-fill the new column
    t.upsert(
        spark.createDataFrame(
            [(2, "b", 20.0, "fr")], "id long, day string, v double, lang string"
        ),
        keys=["id"],
    )
    got = {r["id"]: (r["v"], r["lang"]) for r in t.read().collect()}
    assert got == {1: (1.0, None), 2: (20.0, "fr"), 3: (3.0, "en")}

    # compact heals the heterogeneous file set back onto the hot path
    v = t.compact()
    m = t._manifest(v)
    from python_vegindex_spark.sources.snapshots import _schema_hash
    assert all(g["schema_hash"] == _schema_hash(m["schema"]) for g in m["files"])
    assert t.read().columns == ["id", "day", "v", "lang"]


def test_zone_map_range_pruning(spark, root):
    """Per-group min/max stats prune reads at the manifest level; the
    pruned read equals the plain filter."""
    import datetime as dt

    t = SnapshotTable(spark, root, stats_cols=["ts", "v"])
    rows1 = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i)) for i in range(5)]
    rows2 = [(i, dt.datetime(2024, 2, 1) + dt.timedelta(hours=i), float(i + 100)) for i in range(5)]
    sch = "id long, ts timestamp, v double"
    t.append(spark.createDataFrame(rows1, sch))
    t.append(spark.createDataFrame(rows2, sch))
    m = t._manifest(2)
    assert all(g["stats"]["ts"][0] is not None for g in m["files"])

    # metadata-level: the January range keeps only group 1
    kept = t._select_range(m["files"], {"ts": (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31))})
    assert len(kept) == 1

    got = sorted(
        r["id"] for r in t.read(
            prune_range={"ts": (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31))}
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4]
    # numeric zone map, one-sided bound; result equals the plain filter
    via_prune = sorted(r["id"] for r in t.read(prune_range={"v": (100.0, None)}).collect())
    via_filter = sorted(r["id"] for r in t.read().filter(F.col("v") >= 100.0).collect())
    assert via_prune == via_filter == [0, 1, 2, 3, 4]
    assert len(t._select_range(m["files"], {"v": (100.0, None)})) == 1


def test_streaming_snapshot_sink(spark, tmp_path):
    """foreachBatch snapshot sink: one atomic commit per micro-batch,
    content equals the batch pipeline, and a replayed batch id (the
    post-recovery case) is skipped — exactly-once."""
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.structured import (
        TURNS_SCHEMA,
        run_available_now_snapshot,
        snapshot_batch_writer,
    )

    turns = synth_turns(spark, n_convs=12, seed=3, span_days=10)
    src = str(tmp_path / "src")
    turns.repartition(4).write.parquet(src)

    t = SnapshotTable(spark, str(tmp_path / "snk"))
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    run_available_now_snapshot(stream, str(tmp_path / "ckpt"), t)

    assert t.read().count() == turns.count()
    hist = t.history()
    assert len(hist) >= 2  # maxFilesPerTrigger forced multiple batches
    bids = [h["summary"]["stream_batch_id"] for h in hist]
    assert bids == sorted(bids) and len(set(bids)) == len(bids)

    # replaying the last batch (same id, SAME sink scope = the
    # checkpoint) after a "recovery" is a no-op
    v_before = t.current_version()
    writer = snapshot_batch_writer(t, sink_id=str(tmp_path / "ckpt"))
    writer(turns.limit(3), bids[-1])
    assert t.current_version() == v_before
    # a genuinely new batch id commits
    writer(turns.limit(3), bids[-1] + 1)
    assert t.current_version() == v_before + 1


def test_snapshot_sink_upsert_mode(spark, root):
    """upsert-mode sink MERGEs each batch on keys."""
    from python_vegindex_spark.streaming.structured import snapshot_batch_writer

    t = SnapshotTable(spark, root, partition_by=["day"])
    w = snapshot_batch_writer(t, mode="upsert", keys=["id"])
    w(_mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]), 0)
    w(_mk(spark, [(2, "a", 20.0), (3, "b", 3.0)]), 1)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}
    w(_mk(spark, [(9, "z", 9.0)]), 1)  # replay: skipped
    assert 9 not in {r["id"] for r in t.read().collect()}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        snapshot_batch_writer(t, mode="upsert")


def test_concurrent_append_race(spark, root):
    """N threads race plain append(): the built-in conflict retry (wait
    for the winner's VERSION swap, recompute against the new state)
    lands every commit exactly once, versions gap-free, no rows lost —
    and catches the livelock where a loser retries against the stale
    pointer before the winner's swap."""
    import threading

    t = SnapshotTable(spark, root, partition_by=["day"])
    n_threads, errors = 4, []
    barrier = threading.Barrier(n_threads)

    def _worker(i: int) -> None:
        try:
            df = _mk(spark, [(i * 10 + j, f"d{i}", float(i)) for j in range(3)])
            barrier.wait()  # maximize contention
            t.append(df, summary_extra={"writer": i})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=_worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(1, n_threads + 1))
    assert {h["summary"]["writer"] for h in hist} == set(range(n_threads))
    assert t.read().count() == n_threads * 3
    assert sorted(r["day"] for r in t.read().select("day").distinct().collect()) == [
        f"d{i}" for i in range(n_threads)
    ]


def test_delete_where_cow_scope(spark, root):
    """DELETE WHERE: prune-scoped rewrite, NULL predicate keeps rows,
    no-match is a no-op, time travel sees pre-delete rows."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "a", None)]))
    t.append(_mk(spark, [(3, "b", 3.0), (4, "b", 4.0)]))
    g_b = [g for g in t._manifest(2)["files"] if ["b"] in g["partitions"]][0]

    v = t.delete_where(F.col("v") < 2.0, prune={"day": ["a"]})
    assert v == 3
    m = t._manifest(3)
    assert g_b["group"] in {g["group"] for g in m["files"]}  # b carried
    assert m["summary"]["rows_deleted"] == 1
    got = {r["id"] for r in t.read().collect()}
    assert got == {2, 3, 4}  # id=2 kept: NULL predicate is not a match
    assert {r["id"] for r in t.read(version=2).collect()} == {1, 2, 3, 4}

    # no-match delete: version unchanged, no new group committed
    assert t.delete_where(F.col("v") > 99.0) == 3
    assert t.current_version() == 3


def test_expire_grace_protects_nonlive_groups(spark, root):
    """EVERY non-live group (an in-flight commit's fresh group, or one a
    concurrent rollback may be about to re-reference) survives expiry
    inside the grace window and is GC'd once past it."""
    t = SnapshotTable(spark, root)
    t.append(_mk(spark, [(1, "a", 1.0)]))
    t.overwrite(_mk(spark, [(2, "b", 2.0)]))
    # simulate an in-flight writer: group written, manifest not yet landed
    orphan = t._write_group(_mk(spark, [(9, "z", 9.0)]))
    out = t.expire_snapshots(keep_last=1)  # default grace: nothing deleted
    assert out["expired_snapshots"] == 1 and out["removed_groups"] == 0
    assert os.path.isdir(os.path.join(root, orphan["group"]))
    # a rollback racing the expiry above would still find v1's group —
    # and once past the grace both it and the orphan are GC'd
    out2 = t.expire_snapshots(keep_last=1, grace_s=0.0)
    assert out2["removed_groups"] == 2
    assert not os.path.isdir(os.path.join(root, orphan["group"]))
    assert [r["id"] for r in t.read().collect()] == [2]


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check: random append/upsert/delete/rollback sequences
    applied to both SnapshotTable and an in-memory dict model must agree
    after every op, and every retained version must time-travel to the
    model's recorded history. (hypothesis drives the op stream; one
    Spark table per sequence.)"""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("upsert"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("delete_ge"), st.integers(0, 9)),
        st.tuples(st.just("rollback"), st.integers(1, 3)),
    )

    counter = iter(range(10**9))

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(ops=st.lists(op, min_size=1, max_size=5))
    def run(ops):
        root = str(tmp_path / f"mb{next(counter)}")
        t = SnapshotTable(spark, root, partition_by=["day"])
        model: dict[int, float] = {}
        by_version: dict[int, dict[int, float]] = {}  # committed versions only
        val = iter(range(1, 10**9))

        for kind, arg in ops:
            if kind == "append":
                # appends use fresh ids so the model stays a function
                rows = [(next(val) * 100 + i, f"d{i % 2}", float(i)) for i in arg]
                t.append(_mk(spark, rows))
                model.update({r[0]: r[2] for r in rows})
            elif kind == "upsert":
                rows = [(i, f"d{i % 2}", float(next(val))) for i in sorted(set(arg))]
                t.upsert(_mk(spark, rows), keys=["id"])
                model.update({r[0]: r[2] for r in rows})
            elif kind == "delete_ge":
                if t.current_version() is None:
                    continue
                # a no-match delete commits NO version (checked below by
                # the by_version bookkeeping staying aligned)
                t.delete_where(F.col("id") % 100 >= arg)
                model = {k: v for k, v in model.items() if k % 100 < arg}
            else:  # rollback
                if t.current_version() is None:
                    continue
                target = min(arg, t.current_version())
                t.rollback(target)
                model = dict(by_version[target])
            v_now = t.current_version()
            if v_now is not None and v_now not in by_version:
                by_version[v_now] = dict(model)
            got = {r["id"]: r["v"] for r in (t.read() or _mk(spark, [])).collect()}
            assert got == model, f"after {kind}({arg})"

        # every retained version time-travels to its recorded state
        for v, snap in sorted(by_version.items()):
            got = {r["id"]: r["v"] for r in t.read(version=v).collect()}
            assert got == snap, f"time travel v{v}"

    run()


def test_as_of_timestamp_reads(spark, root):
    import time as _time

    t = SnapshotTable(spark, root)
    t.append(_mk(spark, [(1, "a", 1.0)]))
    mid = _time.time()
    _time.sleep(0.05)
    t.append(_mk(spark, [(2, "b", 2.0)]))
    assert t.version_as_of(mid) == 1
    assert t.read(as_of=mid).count() == 1
    assert t.read(as_of=_time.time()).count() == 2
    with pytest.raises(KeyError):
        t.version_as_of(mid - 1e6)
    with pytest.raises(ValueError):
        t.read(version=1, as_of=mid)


def test_metadata_tables(spark, root):
    """snapshots_df / files_df — the Iceberg metadata-table analogs."""
    t = SnapshotTable(spark, root, partition_by=["day"], stats_cols=["v"])
    t.append(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.upsert(_mk(spark, [(2, "b", 20.0)]), keys=["id"])
    snaps = t.snapshots_df().orderBy("version").collect()
    assert [(r["version"], r["operation"]) for r in snaps] == [
        (1, "append"), (2, "upsert"),
    ]
    assert all(r["committed_at"] > 0 for r in snaps)
    files = t.files_df().collect()
    assert sum(r["rows"] for r in files) == 2
    import json as _json
    parts = {tuple(p) for r in files for p in _json.loads(r["partitions"])}
    assert parts == {("a",), ("b",)}
    stats = [_json.loads(r["stats"]) for r in files]
    assert all("v" in s for s in stats)
    with pytest.raises(ValueError):
        SnapshotTable(spark, root + "_empty").files_df()


def test_crashed_writer_does_not_wedge(spark, root):
    """A writer that dies right after linking its manifest (before the
    VERSION hint swap) leaves a fully committed snapshot: readers see
    it immediately and the next writer commits on top — no wedge."""
    import json as _json

    t = SnapshotTable(spark, root)
    t.append(_mk(spark, [(1, "a", 1.0)]))
    # simulate the crash: hand-write a COMPLETE v2 manifest, never touch VERSION
    g = t._write_group(_mk(spark, [(2, "b", 2.0)]))
    m1 = t._manifest(1)
    manifest = {
        "version": 2, "parent": 1, "operation": "append",
        "committed_at": 0.0, "schema": m1["schema"],
        "partition_by": None,
        "files": m1["files"] + [{k: v for k, v in g.items() if not k.startswith("_")}],
        "summary": {},
    }
    t.io.create_exclusive(t._manifest_path(2), _json.dumps(manifest))
    # VERSION hint still says 1; the manifest listing is the truth
    assert t.io.read_text(t._version_file()).strip() == "1"
    assert t.current_version() == 2
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]
    # the next writer proceeds normally on top of the crashed commit
    v3 = t.append(_mk(spark, [(3, "c", 3.0)]))
    assert v3 == 3 and t.read().count() == 3
    # stray tmp manifests are ignored by the listing
    t.io.swap(t._manifest_path(9) + ".tmp-dead", "{not json")
    assert t.current_version() == 3


def test_upsert_schema_evolved_groups_preserve_values(spark, root):
    """Review regression: a MERGE whose affected groups have
    heterogeneous schemas must read them ALIGNED — kept rows' evolved
    columns must survive, not be NULLed by an arbitrary narrow file
    schema."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0)]))  # narrow group in partition a
    t.append(
        spark.createDataFrame(
            [(2, "a", 2.0, "en")], "id long, day string, v double, lang string"
        )
    )  # wide group, same partition
    t.upsert(
        spark.createDataFrame(
            [(3, "a", 3.0, "fr")], "id long, day string, v double, lang string"
        ),
        keys=["id"],
    )
    got = {r["id"]: r["lang"] for r in t.read().collect()}
    assert got == {1: None, 2: "en", 3: "fr"}  # id=2 kept its lang

    # DELETE over the same heterogeneous set also preserves evolved cols
    t.delete_where(F.col("id") == 1)
    got = {r["id"]: (r["v"], r["lang"]) for r in t.read().collect()}
    assert got == {2: (2.0, "en"), 3: (3.0, "fr")}


def test_upsert_partition_moving_key_replaces_not_duplicates(spark, root):
    """Review regression: when partition_by is NOT a subset of the MERGE
    keys, a key whose partition value changed must still be REPLACED
    (global fallback), never duplicated across partitions."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(5, "a", 1.0), (6, "b", 6.0)]))
    t.upsert(_mk(spark, [(5, "b", 9.9)]), keys=["id"])  # id 5 moves a -> b
    got = {(r["id"], r["day"]): r["v"] for r in t.read().collect()}
    assert got == {(5, "b"): 9.9, (6, "b"): 6.0}


def test_zone_map_date_column_with_datetime_bound(spark, root):
    """Review regression: a DateType stats column queried with a
    datetime bound must not mis-prune the boundary group."""
    import datetime as dt

    t = SnapshotTable(spark, root, stats_cols=["d"])
    t.append(
        spark.createDataFrame(
            [(1, dt.date(2024, 1, 31))], "id long, d date"
        )
    )
    got = t.read(
        prune_range={"d": (dt.datetime(2024, 1, 31), None)}
    ).collect()
    assert [r["id"] for r in got] == [1]


def test_partition_spec_identity_enforced(spark, root):
    """A handle opened with a different partition_by cannot commit (the
    stored tuples are positional); reads prune by the MANIFEST's
    recorded order regardless of the handle's."""
    t = SnapshotTable(spark, root, partition_by=["day"])
    t.append(_mk(spark, [(1, "a", 1.0)]))
    other = SnapshotTable(spark, root, partition_by=["v", "day"])
    with pytest.raises(ValueError, match="partition spec"):
        other.append(_mk(spark, [(2, "b", 2.0)]))


def test_streaming_sink_scope_and_expiry_survival(spark, root):
    """Review regression: idempotence is per sink scope — a fresh
    checkpoint (new sink_id) is NOT skipped against another's counter;
    and the sidecar high-water mark survives snapshot expiry."""
    from python_vegindex_spark.streaming.structured import snapshot_batch_writer

    t = SnapshotTable(spark, root)
    w1 = snapshot_batch_writer(t, sink_id="ckpt-A")
    w1(_mk(spark, [(1, "a", 1.0)]), 0)
    w1(_mk(spark, [(2, "a", 2.0)]), 1)
    assert t.read().count() == 2

    # a NEW sink restarts batch ids at 0 and must not be skipped
    w2 = snapshot_batch_writer(t, sink_id="ckpt-B")
    w2(_mk(spark, [(3, "b", 3.0)]), 0)
    assert t.read().count() == 3

    # expiry trims the manifests carrying ckpt-A's batch ids...
    t.expire_snapshots(keep_last=1, grace_s=0.0)
    # ...but the sidecar still skips a ckpt-A replay
    w1(_mk(spark, [(9, "z", 9.0)]), 1)
    assert t.read().count() == 3


# ------------------------------------------------------------- z-order


def _xy(spark, n=2000):
    """Deterministic pseudo-uniform (x, y) with independent patterns."""
    return (
        spark.range(n)
        .select(
            F.col("id"),
            ((F.col("id") * 37) % 1000).cast("double").alias("x"),
            ((F.col("id") * 91) % 1000).cast("double").alias("y"),
        )
    )


def test_zorder_compact_prunes_multi_dim_boxes(spark, root):
    """Arrival-order groups span the full (x, y) range so zone maps
    prune nothing; after ZORDER BY (x, y) compaction a small box query
    drops most groups on BOTH dimensions at once — and the pruned read
    still equals the plain filter."""
    t = SnapshotTable(spark, root, stats_cols=["x", "y"])
    data = _xy(spark)
    for i in range(4):  # arrival order: each slice spans full x/y range
        t.append(data.filter((F.col("id") % 4) == i))
    box = {"x": (100.0, 200.0), "y": (100.0, 200.0)}
    m0 = t._manifest(t.current_version())
    assert len(t._select_range(m0["files"], box)) == 4  # no pruning

    v = t.compact(target_rows_per_file=250, zorder_by=["x", "y"])
    m = t._manifest(v)
    assert m["operation"] == "zorder_compact"
    assert m["summary"]["zorder_by"] == ["x", "y"]
    n_groups = len(m["files"])
    assert n_groups >= 6  # 2000 rows / 250 target
    picked = t._select_range(m["files"], box)
    # the box is ~1% of the area; the z-layout must prune most groups
    assert len(picked) < n_groups / 2
    # correctness: pruned read == plain filter
    got = sorted(
        r["id"]
        for r in t.read(prune_range=box).collect()
    )
    expect = sorted(
        r["id"]
        for r in data.filter(
            F.col("x").between(100.0, 200.0) & F.col("y").between(100.0, 200.0)
        ).collect()
    )
    assert got == expect


def test_zorder_beats_linear_compaction_on_second_dim(spark, root):
    """Linear compaction (arrival order) keeps every group spanning the
    full y range; z-order bounds both."""
    t_lin = SnapshotTable(spark, root + "_lin", stats_cols=["x", "y"])
    t_z = SnapshotTable(spark, root + "_z", stats_cols=["x", "y"])
    data = _xy(spark)
    t_lin.append(data)
    t_z.append(data)
    t_lin.compact(target_rows_per_file=250)
    t_z.compact(target_rows_per_file=250, zorder_by=["x", "y"])
    box = {"x": (0.0, 120.0), "y": (0.0, 120.0)}
    lin_groups = t_lin._manifest(t_lin.current_version())["files"]
    z_groups = t_z._manifest(t_z.current_version())["files"]
    lin_picked = len(t_lin._select_range(lin_groups, box))
    z_picked = len(t_z._select_range(z_groups, box))
    # linear compact writes ONE group (coalesce) -> no pruning possible;
    # with multiple z groups the same box hits a strict subset
    assert z_picked < len(z_groups)
    assert t_z.read(prune_range=box).count() == t_lin.read(prune_range=box).count()


def test_zorder_timestamp_dimension_and_validation(spark, root):
    t = SnapshotTable(spark, root, stats_cols=["ts", "x"])
    df = spark.range(400).select(
        F.col("id"),
        F.timestamp_micros((F.col("id") * 3_600_000_000)).alias("ts"),
        ((F.col("id") * 53) % 97).cast("double").alias("x"),
        F.lit("s").alias("name"),
    )
    t.append(df)
    v = t.compact(target_rows_per_file=100, zorder_by=["ts", "x"])
    m = t._manifest(v)
    assert m["operation"] == "zorder_compact" and len(m["files"]) >= 2
    assert t.read(version=v).count() == 400
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        t.compact(zorder_by=["name"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.compact(zorder_by=["nope"])


def test_zorder_null_and_degenerate_dims(spark, root):
    """NULLs land in bucket 0 and a constant dimension degrades
    gracefully (bucket 0 everywhere) — the rewrite must not lose rows."""
    t = SnapshotTable(spark, root, stats_cols=["x"])
    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("x"),
        F.lit(5.0).alias("flat"),
    )
    t.append(df)
    v = t.compact(target_rows_per_file=100, zorder_by=["x", "flat"])
    assert t.read(version=v).count() == 300


def test_bloom_pruning(spark, tmp_path):
    """Per-group bloom filters: point lookups skip file groups, never
    lose rows (no false negatives), and the pruned read equals a plain
    filter."""
    import random

    from python_vegindex_spark.sources.snapshots import (
        SnapshotTable,
        _bloom_may_contain,
        _bloom_probes_py,
    )

    t = SnapshotTable(
        spark,
        str(tmp_path / "bloomtab"),
        partition_by=["day"],
        bloom_cols=["conv_id"],
    )
    # three appends with DISJOINT conv populations -> three file groups
    pops = {}
    for gi in range(3):
        rows = [
            (f"d{gi}", f"conv_{gi}_{i}", i) for i in range(200)
        ]
        pops[gi] = [r[1] for r in rows]
        t.append(
            spark.createDataFrame(rows, "day string, conv_id string, v long")
        )
    manifest = t._manifest(t.current_version())
    files = manifest["files"]
    assert len(files) == 3 and all(g.get("bloom") for g in files)

    # a key from group 1 prunes to (usually) one group, never zero rows
    key = pops[1][7]
    kept = t._select_bloom(files, {"conv_id": [key]})
    assert 1 <= len(kept) < 3
    got = t.read(prune_bloom={"conv_id": [key]}).collect()
    exp = t.read().filter(F.col("conv_id") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(got) == 1

    # no-false-negative property over every present key
    rng = random.Random(5)
    for gi in range(3):
        for key in rng.sample(pops[gi], 25):
            assert _bloom_may_contain(files[gi]["bloom"], "conv_id", key), key
    # absent keys: pruning to zero groups is allowed and returns empty
    got = t.read(prune_bloom={"conv_id": ["never_seen"]})
    assert got.count() == 0

    # python/spark probe parity pinned on int-typed keys too
    t2 = SnapshotTable(
        spark, str(tmp_path / "bloomint"), bloom_cols=["uid"]
    )
    t2.append(spark.createDataFrame([(42,), (7,)], "uid long"))
    bl = t2._manifest(t2.current_version())["files"][0]["bloom"]
    assert _bloom_may_contain(bl, "uid", 42) and _bloom_may_contain(bl, "uid", 7)
    assert len(_bloom_probes_py(42, bl["m"], bl["k"])) == 4

    # unsupported type fails loudly
    import pytest as _pt

    t3 = SnapshotTable(
        spark, str(tmp_path / "bloomfloat"), bloom_cols=["x"]
    )
    with _pt.raises(ValueError):
        t3.append(spark.createDataFrame([(1.5,)], "x double"))


# --- round-5: S3ManifestIO protocol semantics under injected faults ---
# (these run once, not per-backend: they drive the backend class
# directly against scheduled ClientError sequences)


def test_s3_create_exclusive_loses_to_existing_key():
    io = _s3_io()
    io.create_exclusive("/tbl/snapshots/v1.json", "a")
    with pytest.raises(FileExistsError):
        io.create_exclusive("/tbl/snapshots/v1.json", "b")
    assert io.read_text("/tbl/snapshots/v1.json") == "a"  # winner intact


def test_s3_transient_faults_are_retried_with_backoff():
    client = FakeS3Client(
        faults={
            "put_object": ["InternalError", "SlowDown"],
            "get_object": ["503"],
            "head_object": ["ServiceUnavailable"],
        }
    )
    sleeps: list[float] = []
    io = S3ManifestIO(
        "b", client=client, backoff_s=0.01, sleep_fn=sleeps.append
    )
    io.swap("/p/VERSION", "7")          # survives two 5xx
    assert io.read_text("/p/VERSION") == "7"   # survives one 503
    assert io.exists("/p/VERSION")      # survives one 503
    assert sleeps == [0.01, 0.02, 0.01, 0.01]  # exponential per-op


def test_s3_transient_fault_exhaustion_propagates():
    from botocore.exceptions import ClientError

    client = FakeS3Client(faults={"get_object": ["503", "503", "503"]})
    io = S3ManifestIO(
        "b", client=client, max_attempts=3, sleep_fn=lambda s: None
    )
    client.put_object(Bucket="b", Key="k", Body=b"x")
    with pytest.raises(ClientError):
        io.read_text("/k")
    # non-transient errors never retry: exactly one call
    client2 = FakeS3Client()
    io2 = _s3_io(client2)
    with pytest.raises(FileNotFoundError):
        io2.read_text("/missing")
    assert client2.calls.count("get_object") == 1


def test_s3_conditional_conflict_loser_sees_file_exists():
    """409 ConditionalRequestConflict with a racer that WINS during the
    backoff: the retry must surface FileExistsError, not overwrite."""
    client = FakeS3Client(
        faults={"put_object": ["ConditionalRequestConflict"]}
    )
    io = _s3_io(client)

    real_sleep = io.sleep_fn

    def racing_sleep(s):
        # the concurrent writer lands its conditional put mid-backoff
        client.put_object(
            Bucket="test-bucket",
            Key="tbl/snapshots/v2.json",
            Body=b"winner",
            IfNoneMatch="*",
        )
        real_sleep(s)

    io.sleep_fn = racing_sleep
    with pytest.raises(FileExistsError):
        io.create_exclusive("/tbl/snapshots/v2.json", "loser")
    assert io.read_text("/tbl/snapshots/v2.json") == "winner"


def test_s3_conditional_conflict_then_clear_retry_wins():
    """409 with NO racer: the conditional put retries and wins."""
    client = FakeS3Client(
        faults={"put_object": ["ConditionalRequestConflict"]}
    )
    io = _s3_io(client)
    io.create_exclusive("/tbl/snapshots/v3.json", "mine")
    assert io.read_text("/tbl/snapshots/v3.json") == "mine"


def test_s3_accepted_write_then_transient_is_not_a_lost_race():
    """The store accepts the conditional put but the response is lost
    to a 5xx AFTER acceptance: the retry path must recognize its own
    body and report success, not FileExistsError."""
    client = FakeS3Client()
    io = _s3_io(client)

    real_put = client.put_object
    state = {"first": True}

    def flaky_put(Bucket, Key, Body, IfNoneMatch=None, **kw):
        if state["first"]:
            state["first"] = False
            real_put(Bucket=Bucket, Key=Key, Body=Body,
                     IfNoneMatch=IfNoneMatch, **kw)
            raise FakeS3Client._err("InternalError", "PutObject")
        return real_put(Bucket=Bucket, Key=Key, Body=Body,
                        IfNoneMatch=IfNoneMatch, **kw)

    client.put_object = flaky_put
    io.create_exclusive("/tbl/snapshots/v4.json", "payload")
    assert io.read_text("/tbl/snapshots/v4.json") == "payload"


def test_s3_remove_and_mtime_contract():
    io = _s3_io()
    with pytest.raises(FileNotFoundError):
        io.remove("/nope")
    with pytest.raises(OSError):
        io.mtime("/nope")
    io.swap("/tbl/PENDING", "[]")
    assert io.mtime("/tbl/PENDING") > 0
    io.remove("/tbl/PENDING")
    assert not io.exists("/tbl/PENDING")


def test_s3_list_names_is_one_level():
    io = _s3_io()
    io.swap("/tbl/snapshots/v1.json", "a")
    io.swap("/tbl/snapshots/v2.json", "b")
    io.swap("/tbl/snapshots/nested/deep.json", "c")
    io.swap("/tbl/VERSION", "2")
    assert io.list_names("/tbl/snapshots") == ["v1.json", "v2.json"]
    assert io.list_names("/tbl/empty") == []


def test_s3_connection_level_faults_are_retried():
    """Round-5 self-review: TCP resets / read timeouts are NOT
    ClientErrors (no HTTP code) — the retry loop must catch botocore's
    connection-level exception family too, on plain ops AND inside
    create_exclusive's ambiguous-outcome handling."""
    from botocore.exceptions import ConnectionError as BotoConnectionError

    class DropFirst(FakeS3Client):
        def __init__(self):
            super().__init__()
            self.drops = {"put_object": 1, "get_object": 1}

        def _maybe_fault(self, op):
            super()._maybe_fault(op)
            if self.drops.get(op, 0) > 0:
                self.drops[op] -= 1
                raise BotoConnectionError(error="connection reset by peer")

    client = DropFirst()
    io = _s3_io(client)
    io.swap("/tbl/VERSION", "5")            # retried past the reset
    assert io.read_text("/tbl/VERSION") == "5"   # retried past the reset

    # create_exclusive: link drops BEFORE the store accepts -> retry wins
    client2 = DropFirst()
    io2 = _s3_io(client2)
    io2.create_exclusive("/tbl/snapshots/v9.json", "z")
    assert io2.read_text("/tbl/snapshots/v9.json") == "z"

    # exhaustion propagates the connection error, not a swallow
    class AlwaysDrop(FakeS3Client):
        def _maybe_fault(self, op):
            super()._maybe_fault(op)
            if op == "get_object":
                raise BotoConnectionError(error="reset")

    io3 = S3ManifestIO(
        "b", client=AlwaysDrop(), max_attempts=3, sleep_fn=lambda s: None
    )
    io3.swap("/k", "x")
    with pytest.raises(BotoConnectionError):
        io3.read_text("/k")
