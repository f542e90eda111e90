"""Multimodal plumbing: metadata-prune-before-decode.

The design goal (functions/multimodal.py) is that filters on cheap sniffed
metadata (format, dims, size) cut the row set BEFORE any expensive pixel
decode runs. These tests pin that: the decode stage receives exactly the
pruned rows, and the GIF dimension parse is a real little-endian binary
parse.
"""

import pyspark.sql.functions as F


def test_gif_dims_are_real_le_u16_parse(spark):
    from ore_etl_spark.functions.multimodal import extract_media_meta

    # width = 0x0140 = 320, height = 0x00F0 = 240, little-endian
    gif = b"GIF89a" + bytes([0x40, 0x01, 0xF0, 0x00]) + b"trailer"
    df = spark.createDataFrame([(1, bytearray(gif))], "id long, media binary")
    meta = extract_media_meta(df).select("meta.*").first()
    assert meta["format"] == "gif"
    assert meta["width"] == 320 and meta["height"] == 240
    assert meta["ok"]


def test_metadata_prune_gates_decode_stage(spark):
    """decode_image_stub must only ever see the metadata-pruned rows: the
    pruned rowcount flows through the decode unchanged, and decode output
    exists exactly for those rows."""
    from ore_etl_spark.functions.multimodal import (
        decode_image_stub, extract_media_meta,
    )

    rows = []
    for i in range(40):
        if i % 4 == 0:  # big gif (passes the prune)
            media = b"GIF89a" + (1000 + i).to_bytes(2, "little") + (500).to_bytes(2, "little") + b"x" * 50
        elif i % 4 == 1:  # small gif (pruned out by width)
            media = b"GIF89a" + (8).to_bytes(2, "little") + (8).to_bytes(2, "little") + b"x"
        elif i % 4 == 2:  # jpeg (pruned out by format)
            media = b"\xff\xd8\xff" + b"j" * 30
        else:  # garbage
            media = b"not-an-image"
        rows.append((i, bytearray(media)))
    df = spark.createDataFrame(rows, "id long, media binary")

    meta = extract_media_meta(df)
    pruned = meta.filter((F.col("meta.format") == "gif")
                         & (F.col("meta.width") >= 1000))
    n_pruned = pruned.count()
    assert n_pruned == 10  # only the big gifs

    decoded = decode_image_stub(pruned, target_size=(4, 4))
    out = decoded.select("id", "pixels").collect()
    assert len(out) == n_pruned                 # decode saw ONLY pruned rows
    assert all(len(r["pixels"]) == 16 for r in out)
    assert {r["id"] % 4 for r in out} == {0}    # and only the big-gif class
