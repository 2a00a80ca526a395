import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _collect_streaming_executors():
    """Free abandoned Dataset executors between tests.

    Ray Data actor pools (map_batches with concurrency=N) are released when
    the consuming execution is garbage-collected; with a small-CPU test
    session, ONE straggler actor surviving into the next test can starve a
    later actor-pool stage into a scheduling deadlock (observed: a Scorer
    actor from emb_ann_topk squatting a CPU while the curation funnel's
    Signer pool waited, 4/4 CPUs held, zero progress for 30 min). A gc pass
    after every test makes the release deterministic."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def sf001_transcripts():
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    return ensure_transcripts("/root/testdata/sf0.001")
