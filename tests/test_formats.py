"""Pages table round-trips byte-identically through every supported
container format (parquet / ORC / JSON-lines / CSV)."""

import pytest

from entity_extractor_by_pointer_spark.sources.formats import read_pages, write_pages
from entity_extractor_by_pointer_spark.sources.pages import generate_pages


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_pages_roundtrip(spark, tmp_path, fmt):
    src = generate_pages(spark, 50, partitions=2)
    path = str(tmp_path / f"pages_{fmt}")
    write_pages(src, path, fmt)
    back = read_pages(spark, path, fmt)
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b, f"{fmt} round-trip diverged"
