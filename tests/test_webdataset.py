"""WebDataset tar-shard sink/source (sources/webdataset.py): layout,
round-trip, determinism, and the one-tar-per-shard contract."""

import glob
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from esdb_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset_shards,
)


@pytest.fixture(scope="module")
def media_df(spark):
    from esdb_spark.operators.jpeg import encode_jpeg
    import numpy as np

    rows = []
    for i in range(40):
        img = np.full((4, 4), (i * 17) % 256, dtype=np.uint8)
        rows.append(
            (i, bytearray(encode_jpeg(img)), f"caption {i}", {"idx": i})
        )
    return spark.createDataFrame(
        rows, "sample_id int, content binary, caption string, "
        "meta struct<idx:int>"
    ).withColumn("meta_json", F.to_json("meta")).drop("meta")


EXTS = {"content": "jpg", "caption": "txt", "meta_json": "json"}


def test_layout_one_tar_per_shard_and_manifest(spark, media_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "corpus")
    mani = write_webdataset_shards(media_df, out, "sample_id", EXTS, n_shards=4)
    tars = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert len(tars) == len(mani["samples_per_shard"]) <= 4
    assert mani["total_samples"] == 40
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f) == mani
    # every tar holds 3 adjacent members per sample, sorted by key
    for t in tars:
        with tarfile.open(t) as tf:
            names = tf.getnames()
        assert len(names) % 3 == 0
        bases = [n.rpartition(".")[0] for n in names]
        assert bases == sorted(bases)
        for i in range(0, len(names), 3):
            assert len({b for b in bases[i : i + 3]}) == 1  # grouped


def test_roundtrip_contents(spark, media_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "corpus")
    write_webdataset_shards(media_df, out, "sample_id", EXTS, n_shards=4)
    back = read_webdataset(spark, out)
    rows = {int(r["key"]): r for r in back.collect()}
    assert len(rows) == 40
    src = {r["sample_id"]: r for r in media_df.collect()}
    for i in (0, 7, 39):
        files = rows[i]["files"]
        assert bytes(files["jpg"]) == bytes(src[i]["content"])
        assert files["txt"].decode() == f"caption {i}"
        assert json.loads(files["json"])["idx"] == i
    # the jpg members decode back to the original constant image
    from esdb_spark.operators.jpeg import decode_jpeg_pixels

    px = decode_jpeg_pixels(bytes(rows[7]["files"]["jpg"]))
    assert px.shape == (4, 4, 1) and int(px[0, 0, 0]) == (7 * 17) % 256


def test_deterministic_shards(spark, media_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("wds")
    a, b = str(base / "a"), str(base / "b")
    write_webdataset_shards(media_df, a, "sample_id", EXTS, n_shards=3)
    write_webdataset_shards(media_df, b, "sample_id", EXTS, n_shards=3)
    for t in sorted(os.path.basename(p) for p in glob.glob(a + "/shard-*.tar")):
        with open(os.path.join(a, t), "rb") as fa, open(
            os.path.join(b, t), "rb"
        ) as fb:
            assert fa.read() == fb.read(), t  # byte-identical re-run


def test_refuses_overwrite_and_missing_columns(spark, media_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "corpus")
    write_webdataset_shards(media_df, out, "sample_id", EXTS, n_shards=2)
    with pytest.raises(FileExistsError):
        write_webdataset_shards(media_df, out, "sample_id", EXTS)
    with pytest.raises(ValueError):
        write_webdataset_shards(
            media_df, out + "2", "sample_id", {"nope": "bin"}
        )
    with pytest.raises(ValueError):
        write_webdataset_shards(media_df, out + "3", "sample_id", {})


def test_null_payload_becomes_empty_member(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(1, None), (2, b"x")], "sample_id int, content binary"
    )
    out = str(tmp_path_factory.mktemp("wds") / "nulls")
    write_webdataset_shards(df, out, "sample_id", {"content": "bin"}, n_shards=1)
    rows = {int(r["key"]): r for r in read_webdataset(spark, out).collect()}
    assert bytes(rows[1]["files"]["bin"]) == b""
    assert bytes(rows[2]["files"]["bin"]) == b"x"


def test_numpy_typed_json_column(spark, tmp_path_factory):
    """An int column mapped to a JSON extension reaches the writer as
    np.int64 — must serialize, not TypeError (round-4 review find)."""
    df = spark.createDataFrame(
        [(1, 7), (2, 9)], "sample_id int, label int"
    )
    out = str(tmp_path_factory.mktemp("wds") / "ints")
    write_webdataset_shards(df, out, "sample_id", {"label": "cls"}, n_shards=1)
    rows = {int(r["key"]): r for r in read_webdataset(spark, out).collect()}
    assert json.loads(rows[1]["files"]["cls"]) == 7


def test_null_key_rejected(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(None, b"x"), (2, b"y")], "sample_id int, content binary"
    )
    out = str(tmp_path_factory.mktemp("wds") / "nullkey")
    with pytest.raises(Exception, match="NULL sample key"):
        write_webdataset_shards(df, out, "sample_id", {"content": "bin"}, n_shards=1)


def test_no_inprogress_debris_after_success(spark, media_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "clean")
    write_webdataset_shards(media_df, out, "sample_id", EXTS, n_shards=2)
    assert not [f for f in os.listdir(out) if "inprogress" in f]


def test_writer_plan_single_shuffle(spark, media_df):
    """The sink's distributed plan: ONE hash repartition on the shard
    key, nothing else — the corpus crosses the network once."""
    from esdb_spark.plans import shuffle_count
    from pyspark.sql import functions as F

    prepared = (
        media_df.select("sample_id", "content")
        .withColumn(
            "_wds_shard",
            F.pmod(F.xxhash64(F.col("sample_id").cast("string")), F.lit(4)).cast("int"),
        )
        .repartition(4, "_wds_shard")
        .sortWithinPartitions("_wds_shard", "sample_id")
    )
    assert shuffle_count(prepared) == 1


def test_scheme_qualified_paths_roundtrip(spark, media_df, tmp_path_factory):
    """Verdict r4 #5: shard IO must work through filesystem APIs, not
    bare POSIX calls — write and read via a file:// URI (local FS
    through the Hadoop/pyarrow scheme machinery, the same code path a
    cluster's hdfs:///s3:// takes) and get byte-identical content to
    the POSIX-path write."""
    base = tmp_path_factory.mktemp("wds")
    uri_out = "file://" + str(base / "via_uri")
    posix_out = str(base / "via_posix")
    m1 = write_webdataset_shards(media_df, uri_out, "sample_id", EXTS, n_shards=4)
    m2 = write_webdataset_shards(media_df, posix_out, "sample_id", EXTS, n_shards=4)
    assert m1 == m2
    # the URI write landed real local files, byte-identical to POSIX's
    for name in sorted(m1["samples_per_shard"]):
        t = f"shard-{int(name):06d}.tar"
        with open(str(base / "via_uri" / t), "rb") as a, open(
            str(base / "via_posix" / t), "rb"
        ) as b:
            assert a.read() == b.read()
    # read back THROUGH the URI
    rows = {
        r["key"]: r["files"]
        for r in read_webdataset(spark, uri_out).collect()
    }
    assert len(rows) == 40
    assert rows["7"]["txt"] == b"caption 7"
    # overwrite refusal also goes through the scheme-aware check
    with pytest.raises(FileExistsError):
        write_webdataset_shards(media_df, uri_out, "sample_id", EXTS)


def test_missing_path_raises(spark, tmp_path_factory):
    """Review r5: a missing/typo'd path must fail fast, not return an
    empty corpus (list_dir maps absent dirs to [])."""
    with pytest.raises(FileNotFoundError, match="no such path"):
        read_webdataset(spark, "/tmp/definitely_missing_wds_xyz")
    empty = str(tmp_path_factory.mktemp("wds") / "not_a_corpus")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError, match="neither shards"):
        read_webdataset(spark, empty)
