"""Source operators: format sniffing (S1), TPC-H dbgen CSV ingest (S2),
test-table registry (S3)."""

from __future__ import annotations

from lakehouse_sfc_spark.sources.loader import (
    infer_date_columns,
    load_input_df,
    register_tables,
    sniff_format,
    tpch_csv_reader,
)

SF = "/root/testdata/sf0.001"


def test_sniff_format_suffixes(tmp_path):
    assert sniff_format("x.parquet")[0] == "parquet"
    fmt, opts = sniff_format("x.csv")
    assert fmt == "csv" and opts["header"] == "true"
    fmt, opts = sniff_format("x.tsv")
    assert fmt == "csv" and opts["sep"] == "\t"
    assert sniff_format("x.jsonl")[0] == "json"
    # directory peek: first non-hidden entry decides
    d = tmp_path / "data"
    d.mkdir()
    (d / "_SUCCESS").touch()
    (d / "part-0001.csv").touch()
    assert sniff_format(str(d))[0] == "csv"
    # unknown suffix falls back to parquet
    assert sniff_format("mystery.bin")[0] == "parquet"


def test_load_input_df_csv_and_json(spark, tmp_path):
    csv_p = tmp_path / "t.csv"
    csv_p.write_text("a,b\n1,x\n2,y\n")
    df = load_input_df(spark, str(csv_p))
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}
    assert df.schema["a"].dataType.simpleString() == "int"  # inferSchema

    json_p = tmp_path / "t.json"
    json_p.write_text('{"a": 1}\n{"a": 2}\n{"a": 3}\n')
    assert load_input_df(spark, str(json_p)).count() == 3


def test_tpch_csv_reader_drops_dummy(spark, tmp_path):
    p = tmp_path / "region.tbl"
    p.write_text("0|AFRICA|comment a|\n1|AMERICA|comment b|\n")
    df = tpch_csv_reader(spark, str(p), "region")
    assert df.columns == ["r_regionkey", "r_name", "r_comment"]
    rows = {r.r_regionkey: r.r_name for r in df.collect()}
    assert rows == {0: "AFRICA", 1: "AMERICA"}


def test_register_tables_creates_views(spark):
    out = register_tables(spark, SF, ("region", "nation"))
    assert set(out) == {"region", "nation"}
    assert spark.sql("SELECT COUNT(*) FROM region").collect()[0][0] == 5
    assert spark.sql("SELECT COUNT(*) FROM nation").collect()[0][0] == 25


def test_infer_date_columns(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01", "2024-01-01", "x"),
            ("2024-02-03", "not a date", "y"),
            ("2024-12-31", "2024-05-06", "z"),
            (None, "2024-07-08", None),
        ],
        ["good", "mixed", "text"],
    )
    out = infer_date_columns(df, threshold=0.9)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["good"] == "date"      # 3/3 parse
    assert types["mixed"] == "string"   # 3/4 = 75% < 90%
    assert types["text"] == "string"
    assert out.filter("good = DATE '2024-01-01'").count() == 1
