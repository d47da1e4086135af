"""The nine heaviest streaming / e2e cases, run CONCURRENTLY in one test.

Serially these cost ~150 s of suite wall — almost all of it
micro-batch trigger latency and awaitTermination idling, not CPU. Each
case owns its source/checkpoint/target dirs (isolated state), Structured
Streaming runs any number of queries per session, and awaitTermination
blocks in the JVM with the GIL released — so a thread pool turns the sum
into the max. Same consolidation precedent as the registry plan sweep
(tests/test_plans.py) and the similarity fast-path parity suite; failures
are reported per-case by name.
"""

from __future__ import annotations

import tempfile
import traceback
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from tests.conftest import SF_SMOKE
from tests.test_stateful_dedup import _case_dedup_across_micro_batches
from tests.test_stream_curation import (
    _case_composed_curate_then_incremental_dedup,
    _case_curate_filters_dedups_and_resumes,
    _case_curate_ttl_expires_and_bounds_state,
)
from tests.test_stream_drain import _case_drain_exactly_once
from tests.test_stream_join import (
    _case_join_incremental_no_duplicates,
    _case_join_matches_batch,
)
from tests.test_stream_rollup import (
    _case_rollup_compaction_prunes_and_matches,
    _case_rollup_matches_batch_and_resumes,
)


def _tmp() -> Path:
    return Path(tempfile.mkdtemp(prefix="olake_stream_cc_"))


CASES = {
    "curate_filters_dedups_and_resumes":
        lambda spark: _case_curate_filters_dedups_and_resumes(spark, _tmp()),
    "curate_ttl_expires_and_bounds_state":
        lambda spark: _case_curate_ttl_expires_and_bounds_state(spark, _tmp()),
    "composed_curate_then_incremental_dedup":
        lambda spark: _case_composed_curate_then_incremental_dedup(spark, _tmp()),
    "drain_exactly_once":
        lambda spark: _case_drain_exactly_once(spark, _tmp()),
    "join_matches_batch":
        lambda spark: _case_join_matches_batch(spark, SF_SMOKE),
    "join_incremental_no_duplicates":
        lambda spark: _case_join_incremental_no_duplicates(spark),
    "rollup_matches_batch_and_resumes":
        lambda spark: _case_rollup_matches_batch_and_resumes(spark, _tmp()),
    "rollup_compaction_prunes_and_matches":
        lambda spark: _case_rollup_compaction_prunes_and_matches(spark, _tmp()),
    "dedup_across_micro_batches":
        lambda spark: _case_dedup_across_micro_batches(spark, _tmp()),
}


def test_streaming_e2e_concurrent(spark):
    def run(item):
        name, fn = item
        try:
            fn(spark)
            return None
        except Exception:
            return f"{name}:\n{traceback.format_exc()}"

    with ThreadPoolExecutor(max_workers=len(CASES)) as pool:
        failures = [f for f in pool.map(run, CASES.items()) if f]
    assert not failures, "\n\n".join(failures)
