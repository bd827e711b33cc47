"""Metadata-IO portability: the fsio shim must behave identically through
its local backend (plain paths) and its Hadoop FileSystem backend (URI
paths). `file:` URIs exercise the full JVM code path — the same calls a
cluster makes against hdfs:// or s3a:// — without needing object storage.
"""

import pyspark.sql.functions as F

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans import fsio
from nifi_processors_spark.plans.table import IceliteTable
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log


def test_fsio_primitives_hadoop_backend(spark, tmp_path):
    root = f"file:{tmp_path}/meta"
    assert fsio.is_remote(root) and not fsio.is_remote(str(tmp_path))
    fsio.makedirs(root)
    p = fsio.join(root, "x.json")
    fsio.write_json_atomic(p, {"a": 1, "s": "héllo"})
    assert fsio.exists(p)
    assert fsio.read_json(p) == {"a": 1, "s": "héllo"}
    fsio.write_json_atomic(p, {"a": 2})  # atomic overwrite via rename
    assert fsio.read_json(p) == {"a": 2}
    assert fsio.listdir(root) == ["x.json"]
    assert fsio.getsize(p) > 0
    fsio.remove(p)
    assert not fsio.exists(p)


def test_cdc_pipeline_over_file_uri(spark, tmp_path):
    """The full apply loop with table/changelog/state on URI paths: every
    snapshot, marker, registry, metrics and quarantine file goes through
    the Hadoop FS backend; result must equal the local-path run."""
    local_cl = str(tmp_path / "cl")
    write_change_log(spark, GenLogConfig(n_events=1500, n_epochs=2, n_keys=200), local_cl)

    ref = ChangeApplier(spark, str(tmp_path / "t_local"), local_cl,
                        str(tmp_path / "s_local"), n_buckets=4)
    ref.run()

    uri = ChangeApplier(spark, f"file:{tmp_path}/t_uri", f"file:{tmp_path}/cl",
                        f"file:{tmp_path}/s_uri", n_buckets=4)
    recs = uri.run()
    assert len(recs) == 2

    def fp(df):
        return sorted(
            (r["repo"], r["path"], r["sha"])
            for r in df.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
        )

    assert fp(uri.state()) == fp(ref.state())
    # exactly-once markers live behind the URI backend too
    assert uri.pending_epochs() == []
    assert len(uri.run()) == 0  # replay is a no-op
    # time travel through URI metadata
    t = IceliteTable(spark, f"file:{tmp_path}/t_uri")
    assert t.current_snapshot_id() >= 2
    assert t.read(snapshot_id=1).count() > 0
    # maintenance over the URI backend: tombstone + snapshot expiry go
    # through Hadoop-FS listdir/remove; state must survive unchanged
    before = fp(uri.state())
    t.expire_tombstones(min_commit_seq=10 ** 9)
    t.expire_snapshots(keep_last=1)
    assert t.snapshot()["tombstone_watermark"] == 10 ** 9
    assert fp(uri.state()) == before


def test_pointer_swap_never_missing_for_readers(spark, tmp_path):
    """Regression (round-2 verdict): the old remote pointer swap deleted
    the destination before renaming (and Hadoop's overwrite-rename is only
    atomic on HDFS proper — the local AbstractFileSystem default is
    delete-then-rename too), so a reader of the table VERSION pointer or
    the registry could observe NO file at all mid-swap. publish_json's
    generation files never delete the only copy: readers must succeed on
    every attempt while the writer swaps continuously."""
    import threading

    root = f"file:{tmp_path}/swap"
    fsio.makedirs(root)
    ptr = fsio.join(root, "VERSION")
    fsio.publish_json(ptr, 0)
    assert fsio.pointer_exists(ptr)
    assert fsio.load_json(ptr) == 0

    errors: list[str] = []
    seen: set[int] = set()
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                seen.add(fsio.load_json(ptr))
            except Exception as e:  # missing OR partial pointer = the bug
                errors.append(repr(e))

    t = threading.Thread(target=reader)
    t.start()
    try:
        for i in range(1, 80):
            fsio.publish_json(ptr, i)
    finally:
        stop.set()
        t.join()
    assert errors == []
    assert seen, "reader never completed a read"
    assert seen <= set(range(80))
    # steady state: exactly one generation survives, newest value wins
    assert fsio.load_json(ptr) == 79
    names = [n for n in fsio.listdir(root) if n.startswith("VERSION")]
    assert len(names) == 1


def test_pointer_default_never_masks_live_pointer(spark, tmp_path):
    """ADVICE r3: load_json(default=...) must mean 'never published', not
    'unreadable'. A corrupt live generation has to raise — returning the
    default would silently reset a schema registry / config tracker over
    live data. Clean absence still returns the default."""
    import threading

    import pytest

    root = f"file:{tmp_path}/corrupt"
    fsio.makedirs(root)
    ptr = fsio.join(root, "registry.json")
    # clean absence -> default
    assert fsio.load_json(ptr, default={"versions": []}) == {"versions": []}
    # live but corrupt -> raises even with a default
    fsio.publish_json(ptr, {"versions": [1]})
    names = [n for n in fsio.listdir(root) if n.startswith("registry.json.")]
    assert len(names) == 1
    fsio._write_text(fsio.join(root, names[0]), "{not json")
    with pytest.raises(Exception) as ei:
        fsio.load_json(ptr, default={"versions": []})
    assert not isinstance(ei.value, FileNotFoundError)
    # hammer variant: under continuous swaps a defaulted reader must never
    # observe the default while the pointer is live
    fsio.publish_json(ptr, 0)
    sentinel = object()
    hits: list[object] = []
    errors: list[str] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                v = fsio.load_json(ptr, default=sentinel)
                if v is sentinel:
                    hits.append(v)
            except Exception as e:
                errors.append(repr(e))

    t = threading.Thread(target=reader)
    t.start()
    try:
        for i in range(1, 80):
            fsio.publish_json(ptr, i)
    finally:
        stop.set()
        t.join()
    assert hits == [] and errors == []


def test_pointer_legacy_bare_file_migration(spark, tmp_path):
    """A pre-existing bare pointer file (legacy layout / a local-path table
    later accessed by URI) is read correctly and upgraded on next publish."""
    root = f"file:{tmp_path}/legacy"
    fsio.makedirs(root)
    ptr = fsio.join(root, "VERSION")
    fsio.write_json_atomic(ptr, 7)  # legacy bare file
    assert fsio.pointer_exists(ptr)
    assert fsio.load_json(ptr) == 7
    fsio.publish_json(ptr, 8)
    assert fsio.load_json(ptr) == 8
    assert not fsio.exists(ptr)  # bare file cleaned up after migration
    assert fsio.load_json(fsio.join(root, "MISSING"), default=None) is None
