"""doc_bloom_dedup: Bloom prefilter + exact anti-join verify. Correctness
must be INDEPENDENT of the Bloom parameters — a deliberately tiny filter
(high false-positive rate) must return the identical new-doc set, with the
false positives rescued by the exact verify exchange."""

import numpy as np

from quant_feature_pipeline_ray.pipelines import training_data as td

SF = "/root/testdata/sf0.001"


def _expected(sf):
    import hashlib

    import pandas as pd

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    u32 = docs["doc_id"].map(lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
    base = set(docs.loc[u32 < int(0.7 * 2**32), "text"])
    inc = docs[u32 >= int(0.7 * 2**32)]
    return np.sort(inc.loc[~inc["text"].isin(base), "doc_id"].to_numpy())


def test_bloom_dedup_matches_exact_antijoin(ray_session):
    got = td.doc_bloom_dedup(SF)["doc_id"].to_numpy()
    np.testing.assert_array_equal(got, _expected(SF))


def test_bloom_params_do_not_change_result(ray_session):
    # 256-bit filter over ~350 base docs -> almost every probe is a false
    # positive; the exact verify must still produce the identical set
    tiny = td.doc_bloom_dedup(SF, bits_log2=8, n_hashes=2)["doc_id"].to_numpy()
    np.testing.assert_array_equal(tiny, _expected(SF))
