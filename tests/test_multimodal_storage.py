"""Binary assets at rest: parquet round-trip of payload + metadata.

The multimodal layout (opaque binary column + typed metadata struct)
must survive storage with payload bytes intact and metadata-only reads
pruning the heavy column."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.operators.multimodal import binary_assets


def test_binary_roundtrip_and_column_pruning(spark, tmp_path):
    assets = binary_assets(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "assets")
    assets.write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    # payload bytes identical (checksum over md5 of content)
    a = assets.select(F.sum(F.crc32(F.md5("content").cast("binary"))).alias("c"))
    b = back.select(F.sum(F.crc32(F.md5("content").cast("binary"))).alias("c"))
    assert a.collect()[0].c == b.collect()[0].c
    assert back.count() == assets.count()
    # metadata struct typed correctly after round-trip
    row = back.select("meta.kind", "meta.width", "meta.height").first()
    assert row.kind == "image/fake" and row.width >= 64

    # metadata-only query prunes the binary column at the scan
    q = back.select("doc_id", "meta.width")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m and "content" not in m.group(1), "binary column not pruned"
