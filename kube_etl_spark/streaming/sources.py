"""Stream-source helpers for tests and replay tooling.

The reference's source is a Kubernetes watch (one per GVK,
/root/reference/syncer/controllers/krmsyncer_controller.go:283-325);
the Spark-native equivalents are file/Kafka streams. `chunked_file_stream`
turns any batch DataFrame into a deterministic multi-micro-batch file
stream: rows are split into ordered chunk files, file mtimes force the
FileStreamSource's processing order, and maxFilesPerTrigger=1 yields one
micro-batch per chunk — so tests can replay a fixture as a stream with a
known arrival order (what watermark/late-data assertions need).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def chunked_file_stream(
    spark: SparkSession,
    df: DataFrame,
    directory: str,
    n_chunks: int,
    order_col: str,
) -> DataFrame:
    """Materialize df (ordered by order_col) as n_chunks json files and
    return a file-source streaming DataFrame that replays them one
    micro-batch per chunk, in order.

    The collect below is deliberate and CAPPED: this builder exists to
    replay bounded test fixtures with a deterministic arrival order
    (mtime-spaced files), which requires driver-side file writes. It is
    not a data-path operator — production streams come straight from
    readStream file/Kafka sources; the cap makes misuse loud instead of
    an OOM."""
    cap = 1_000_000
    os.makedirs(directory, exist_ok=True)
    schema = df.schema
    rows = df.orderBy(order_col).limit(cap + 1).toJSON().collect()
    if len(rows) > cap:
        raise ValueError(
            f"chunked_file_stream is a fixture-replay helper capped at {cap} rows; "
            "stream production data with spark.readStream directly"
        )
    per = max(1, (len(rows) + n_chunks - 1) // n_chunks)
    now = time.time()
    for i in range(0, len(rows), per):
        chunk_path = os.path.join(directory, f"chunk-{i // per:05d}.json")
        with open(chunk_path, "w") as f:
            f.write("\n".join(rows[i : i + per]))
        # mtime drives FileStreamSource ordering; space them 10s apart.
        os.utime(chunk_path, (now + (i // per) * 10, now + (i // per) * 10))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(directory)
    )

