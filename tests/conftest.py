import os
import sys

# Pin BLAS to one thread BEFORE numpy initializes: multi-threaded sgemm is
# not bitwise-reproducible, and the span-parity gate compares float32 scores
# exactly. Spark workers get the same pinning via spark.executorEnv.* in
# session.get_spark().
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_extractor_by_pointer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="eeps-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
