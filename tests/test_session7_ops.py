"""Round-4 session-7 operators: C4 blocklist filter, Gopher quality-rule
battery, banded-Hamming perceptual media near-dup pairs, dialog-act tagging.

Each op also has an exact DuckDB oracle (scripts/check_contract.py); these
tests pin the properties the oracle can't state — pigeonhole recall of the
band blocking, flag/verdict consistency, straight-line recomputes."""

import re
from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_blocklist_filter_straightline(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    got = td.doc_blocklist_filter(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).sort_values(
        "doc_id", ignore_index=True
    )
    pat = re.compile(r"\b(?:" + "|".join(map(re.escape, td._BLOCKLIST)) + r")\b")
    exp = docs["text"].map(lambda t: len(pat.findall(t))).to_numpy()
    assert (got["n_blocked"].to_numpy() == exp).all()
    assert (got["keep"].to_numpy() == (exp == 0)).all()
    # verdict must have variance on this corpus or the filter tests nothing
    assert got["keep"].any() and not got["keep"].all()


def test_gopher_rules_flags_and_verdict(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    got = td.doc_gopher_rules(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    flags = ["r_wordcount", "r_meanlen", "r_stopwords", "r_distinct", "r_topword"]
    # keep is exactly the AND of the per-rule flags
    assert (got["keep"].to_numpy() == got[flags].all(axis=1).to_numpy()).all()
    # every rule fires both ways somewhere (thresholds chosen for variance)
    for f in flags:
        assert got[f].any(), f
    assert not got[flags].all(axis=None)
    # straight-line recompute of one doc's stats
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    row = docs.iloc[7]
    toks = row["text"].split(" ")
    g = got[got["doc_id"] == row["doc_id"]].iloc[0]
    assert g["n_words"] == len(toks)
    assert g["top_word_frac"] == max(Counter(toks).values()) / len(toks)
    assert g["distinct_ratio"] == len(set(toks)) / len(toks)


def test_media_ahash_dups_pigeonhole_and_brute(ray_session):
    from quant_feature_pipeline_ray.pipelines import multimodal as mm

    n_bands, max_hamming = 8, 26
    sigs = mm.media_ahash(SF).to_pandas()
    h = sigs["ahash64"].to_numpy().view(np.uint64)
    ids = sigs["media_id"].to_numpy()
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    bands = (h[:, None] >> (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))) & mask

    got = (
        mm.media_ahash_dups(SF, n_bands=n_bands, max_hamming=max_hamming)
        .to_pandas()
        .sort_values(["media_a", "media_b"], ignore_index=True)
    )
    # brute-force the DEFINED set: share >=1 band AND hamming <= threshold
    exp = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = int(bin(int(h[i]) ^ int(h[j])).count("1"))
            if ham <= max_hamming and (bands[i] == bands[j]).any():
                a, b = sorted((int(ids[i]), int(ids[j])))
                exp.append((a, b, ham))
    exp_df = pd.DataFrame(exp, columns=["media_a", "media_b", "hamming"]).sort_values(
        ["media_a", "media_b"], ignore_index=True
    )
    assert len(got) == len(exp_df) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), exp_df.astype("int64"))
    # pigeonhole: every pair closer than n_bands bits MUST be found
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = int(bin(int(h[i]) ^ int(h[j])).count("1"))
            if ham < n_bands:
                a, b = sorted((int(ids[i]), int(ids[j])))
                assert ((got["media_a"] == a) & (got["media_b"] == b)).any()


def test_dialog_acts_strict_argmax(ray_session):
    import __ray_entry__ as em

    got = em.queries()["t_dialog_acts"](SF).to_pandas()
    hits = got[["q_hits", "a_hits", "t_hits"]].to_numpy()
    best = hits.max(axis=1)
    unique = (hits == best[:, None]).sum(axis=1) == 1
    acts = np.array(["question", "answer", "action"], dtype=object)
    exp = np.where(unique, acts[hits.argmax(axis=1)], "other")
    assert (got["act"].to_numpy() == exp).all()
    # all four labels occur on this corpus
    assert set(got["act"].unique()) == {"question", "answer", "action", "other"}
