"""SFT pair extraction (t_sft_pairs): exact parity vs a pure-Python
straight-line implementation (per assistant turn, walk prior turns backward
while the rendered context fits the budget), plus invariants: rendered
context length consistency, budget respected, maximality (one more prior
turn would overflow), and target == the assistant turn's text."""

import glob
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
BUDGET = 1024


def straight_sft_pairs(path: str, budget: int) -> pd.DataFrame:
    df = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(os.path.join(path, "*.parquet")))],
        ignore_index=True,
    )
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df[~df.duplicated(["conv_id", "turn_idx"], keep="last")]
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        lines = (g["role"] + ": " + g["text"]).tolist()
        roles = g["role"].tolist()
        idxs = g["turn_idx"].tolist()
        texts = g["text"].tolist()
        for i in range(len(lines)):
            if roles[i] != "assistant":
                continue
            kept: list[int] = []
            total = 0
            for j in range(i - 1, -1, -1):
                add = len(lines[j]) + (1 if kept else 0)
                if total + add > budget:
                    break
                total += add
                kept.append(j)
            kept.reverse()
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": idxs[i],
                    "n_ctx_turns": len(kept),
                    "ctx_chars": sum(len(lines[j]) for j in kept),
                    "context": "\n".join(lines[j] for j in kept),
                    "target": texts[i],
                }
            )
    out = pd.DataFrame(rows)
    for c in ("turn_idx", "n_ctx_turns", "ctx_chars"):
        out[c] = out[c].astype("int64")
    return out


@pytest.fixture(scope="module")
def pairs(ray_session):
    import __ray_entry__ as entrymod
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(SF)
    got = (
        entrymod.queries()["t_sft_pairs"](SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    ref = straight_sft_pairs(path, BUDGET).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    return got, ref


def test_exact_parity(pairs):
    got, ref = pairs
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )


def test_budget_and_render_consistency(pairs):
    got, _ = pairs
    nonempty = got[got["n_ctx_turns"] > 0]
    # rendered length = chars + (n-1) separators, and always within budget
    rendered = nonempty["context"].str.len()
    assert (rendered == nonempty["ctx_chars"] + nonempty["n_ctx_turns"] - 1).all()
    assert (rendered <= BUDGET).all()
    empty = got[got["n_ctx_turns"] == 0]
    assert (empty["context"] == "").all()
    assert (empty["ctx_chars"] == 0).all()


def test_mix_nontrivial(pairs):
    got, _ = pairs
    # the fixture must exercise truncated AND un-truncated contexts AND
    # first-turn-assistant empty contexts for the parity to mean anything
    assert (got["n_ctx_turns"] > 0).any()
    assert (got["ctx_chars"] + got["n_ctx_turns"] - 1 > BUDGET // 2).any()


def test_one_pair_per_assistant_turn(pairs, ray_session):
    got, _ = pairs
    import glob as _g

    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(SF)
    df = pd.concat(
        [pd.read_parquet(f) for f in sorted(_g.glob(os.path.join(path, "*.parquet")))],
        ignore_index=True,
    )
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df[~df.duplicated(["conv_id", "turn_idx"], keep="last")]
    n_assistant = int((df["role"] == "assistant").sum())
    assert len(got) == n_assistant
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
