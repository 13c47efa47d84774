from pyspark.sql import functions as F

from entity_extractor_by_pointer_spark.operators.extract import (
    _extract_one,
    with_extracted_text,
)
from entity_extractor_by_pointer_spark.sources.pages import (
    _synth_text,
    generate_pages,
    render_html,
)


def test_render_extract_roundtrip_local():
    for idx in range(50):
        text = _synth_text(idx)
        assert _extract_one(render_html(text, f"Page {idx}")) == text


def test_extraction_byte_identity_distributed(spark):
    pages = generate_pages(spark, 300, partitions=8)
    extracted = with_extracted_text(pages)
    mismatches = extracted.where(F.col("text") != F.col("extracted_text")).count()
    assert mismatches == 0


def test_generator_is_deterministic_across_parallelism(spark):
    a = generate_pages(spark, 120, partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 120, partitions=12).orderBy("url").collect()
    assert a == b


def test_pages_schema_matches_input_hint(spark):
    df = generate_pages(spark, 5)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
