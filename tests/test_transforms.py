"""Vectorized transformer registry — oracle = local stdlib recompute,
the reference's own test strategy (test_md5.py:72-83, test_compress_unit.py)."""

import bz2
import gzip
import hashlib

import pytest
from pyspark.sql import functions as F

from ais_etl_spark import html as htmlmod
from ais_etl_spark.transforms import compile_pipeline
from ais_etl_spark.transforms.registry import TRANSFORMS, apply_transform


@pytest.fixture()
def pages(spark):
    rows = [
        ("https://a/x", "alpha text\nbeta", "en"),
        ("https://b/y", "gamma & <delta>", "fr"),
        ("https://c/z", "zeta", "zh"),
    ]
    df = spark.createDataFrame(rows, "url string, text0 string, lang0 string")
    from ais_etl_spark.transforms.builtin import synth_html_udf

    return df.withColumn("html", synth_html_udf("url", "text0", "lang0"))


def test_registry_has_reference_parity_set():
    for name in ("echo", "hello_world", "md5", "xxhash", "compress",
                 "extract_text", "extract_lang", "regex_route"):
        assert name in TRANSFORMS


def test_extract_text_matches_pure_python_oracle(pages):
    out = apply_transform(pages, "extract_text", src="html", dst="text").collect()
    for r in out:
        assert r.text == htmlmod.extract_text_bytes(bytes(r.html))
        assert r.text == r.text0  # byte-identical round trip


def test_extract_lang(pages):
    out = apply_transform(pages, "extract_lang", src="html", dst="lang").collect()
    assert all(r.lang == r.lang0 for r in out)


def test_md5_matches_hashlib(pages):
    out = apply_transform(pages, "md5", src="html", dst="digest").collect()
    for r in out:
        assert r.digest == hashlib.md5(bytes(r.html)).hexdigest()


def test_codec_round_trip(pages, spark):
    for algo, mod in (("gzip", gzip), ("bz2", bz2)):
        comp = apply_transform(pages.select("url", F.col("html").alias("payload")),
                               "compress", src="payload", dst="c", mode="compress",
                               algorithm=algo)
        rt = apply_transform(comp, "compress", src="c", dst="rt", mode="decompress",
                             algorithm=algo).collect()
        for r in rt:
            assert bytes(r.rt) == bytes(r.payload)
            assert bytes(r.c) == (gzip.compress(bytes(r.payload), mtime=0) if algo == "gzip"
                                  else bz2.compress(bytes(r.payload)))


def test_decompress_rejects_bad_magic(pages):
    bad = pages.select(F.lit(b"not-gzip").alias("payload"))
    with pytest.raises(Exception, match="magic"):
        apply_transform(bad, "compress", src="payload", mode="decompress",
                        algorithm="gzip").collect()


def test_regex_route(pages):
    out = apply_transform(pages, "regex_route", src="url",
                          pattern=r".*/x$", dst_prefix="dst/").collect()
    byurl = {r.url: r for r in out}
    assert byurl["https://a/x"].route_match and byurl["https://a/x"].route_dst == "dst/x"
    assert not byurl["https://b/y"].route_match and byurl["https://b/y"].route_dst is None


def test_spec_pipeline_compiles_in_order(pages):
    spec = [
        {"op": "extract_text", "src": "html", "dst": "text"},
        {"op": "md5", "src": "text", "dst": "fp"},
        {"op": "with_column", "name": "n_chars", "expr": "length(text)"},
        {"op": "filter", "expr": "n_chars > 4"},
        {"op": "rename", "from": "fp", "to": "fingerprint"},
        {"op": "select", "cols": ["url", "text", "fingerprint", "n_chars"]},
    ]
    out = compile_pipeline(pages, spec)
    assert out.columns == ["url", "text", "fingerprint", "n_chars"]
    rows = out.collect()
    assert {r.url for r in rows} == {"https://a/x", "https://b/y"}  # 'zeta' filtered


def test_xxhash64_py_matches_spark_builtin(spark):
    """Algorithm check: the pure-Python XXH64 must be bit-identical to
    Spark's JVM XxHash64 at seed 42 for every tail-length code path
    (0/1/3/4/7/8/31/32/100 bytes)."""
    from ais_etl_spark.transforms.builtin import xxhash64_py

    payloads = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh",
                "x" * 31, "y" * 32, "The quick brown fox! " * 5]
    df = spark.createDataFrame([(p,) for p in payloads], "s string")
    got = {r.s: r.h for r in
           df.select("s", F.lower(F.lpad(F.hex(F.xxhash64("s")), 16, "0")).alias("h")).collect()}
    for p in payloads:
        assert got[p] == f"{xxhash64_py(p.encode(), 42):016x}", p


def test_xxhash_arbitrary_seed(pages):
    """Seeds ≠ 42 run the fallback UDF; recompute locally as oracle."""
    from ais_etl_spark.transforms.builtin import xxhash64_py

    out = apply_transform(pages, "xxhash", src="html", dst="xxh", seed=7).collect()
    for r in out:
        assert r.xxh == f"{xxhash64_py(bytes(r.html), 7):016x}"
    # seed must actually change the digest
    out42 = apply_transform(pages, "xxhash", src="html", dst="xxh", seed=42).collect()
    assert all(a.xxh != b.xxh for a, b in zip(out, out42))


def test_batch_rename_dual_sink(pages, spark, tmp_path):
    """Mirrors transformers/tests/test_batch_rename.py:27-54: the
    pass-through leg is byte-identical to the input, the second sink
    holds exactly the matching payloads under prefix+basename, and a
    re-run leaves the sink byte-identical (idempotent copy-not-move)."""
    from ais_etl_spark.transforms.builtin import batch_rename_write

    dst = str(tmp_path / "sink")
    out = batch_rename_write(
        pages, dst, src="url", pattern=r"/[xy]$", dst_prefix="routed/",
        payload_cols=["html"],
    )
    # pass-through: the returned frame IS the input, bytes unchanged
    orig = {r.url: bytes(r.html) for r in pages.collect()}
    assert {r.url: bytes(r.html) for r in out.collect()} == orig

    def read_sink():
        return {r.dst_key: bytes(r.html) for r in spark.read.parquet(dst).collect()}

    got = read_sink()
    assert got == {"routed/x": orig["https://a/x"], "routed/y": orig["https://b/y"]}
    # idempotent: second run, identical sink
    batch_rename_write(pages, dst, src="url", pattern=r"/[xy]$",
                       dst_prefix="routed/", payload_cols=["html"])
    assert read_sink() == got


def test_batch_rename_foreach_batch_idempotent(pages, spark, tmp_path):
    from ais_etl_spark.transforms.builtin import batch_rename_foreach_batch

    dst = str(tmp_path / "stream-sink")
    fn = batch_rename_foreach_batch(dst, src="url", pattern=r"/x$",
                                    dst_prefix="routed/", payload_cols=["html"])
    fn(pages, 7)
    fn(pages, 7)  # replayed micro-batch overwrites its own subdir
    rows = spark.read.parquet(dst + "/batch_id=7").collect()
    assert [r.dst_key for r in rows] == ["routed/x"]


def test_hello_world_and_echo(pages):
    assert apply_transform(pages, "echo").columns == pages.columns
    out = apply_transform(pages, "hello_world").select("greeting").distinct().collect()
    assert out == [("Hello World!",)] or out[0].greeting == "Hello World!"


def test_xxhash_sql_oracle_bit_exact_edges():
    """The DuckDB XXH64 transliteration (oracle_xxhash) must be
    bit-identical to the spec-twin xxhash64_py on every length class:
    empty, tail-only (<32B), exact stripe boundaries, multi-stripe with
    every tail combination, and multi-byte UTF-8."""
    import duckdb

    from ais_etl_spark.oracle_xxhash import xxhash_oracle_sql
    from ais_etl_spark.transforms.builtin import xxhash64_py

    cases = [
        "", "a", "abc", "1234567", "12345678", "123456789012",
        "a" * 31, "b" * 32, "c" * 33, "d" * 40, "e" * 44, "f" * 45,
        "g" * 63, "h" * 64, "i" * 95, "j" * 100,
        "héllo wörld ✓ 漢字テスト" * 3,  # multi-byte utf-8
        "x" * 32 + "tail7..",  # stripe + 8B-less tail
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(cases))
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(xxhash_oracle_sql("documents")).fetchall()
    }
    assert len(got) == len(cases)
    for i, text in enumerate(cases):
        b = text.encode("utf-8")
        want = (f"{xxhash64_py(b, 42):016x}", f"{xxhash64_py(b, 7):016x}", True)
        assert got[i] == want, (i, len(b), got[i], want)
