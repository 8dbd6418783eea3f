"""Streaming layer (SURVEY.md §2.9, ST1-ST8).

Design rule: every transformation is written against a plain DataFrame
and works identically on a batch frame and a `readStream` frame — the
Structured Streaming contract. The registry's q_stream_* entries run the
builders in batch mode (that IS the declared batch-equivalent oracle
semantics); tests/test_streaming.py runs the same builders on real
file streams with watermarks and availableNow triggers.
"""

from . import (  # noqa: F401
    cdc,
    matview,
    monitor,
    neardup,
    rollup,
    semdedup,
    sources,
    stateful,
    substrdup,
    sync,
    windowed,
)
