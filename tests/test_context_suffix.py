"""Context-window assembly (t_context_suffix): exact parity vs a pure-Python
straight-line implementation (sort → dedup keep-last → walk each
conversation's turns from the end, keep while the rendered suffix fits the
budget) over the sf0.001 transcript fixture, plus edge-case coverage: a
budget smaller than some final turn (zero turns kept) and a budget large
enough to keep whole conversations."""

import glob
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
BUDGET = 4096


def straight_context_suffix(path: str, budget: int) -> pd.DataFrame:
    df = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(os.path.join(path, "*.parquet")))],
        ignore_index=True,
    )
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df[~df.duplicated(["conv_id", "turn_idx"], keep="last")]
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        lines = (g["role"] + ": " + g["text"]).tolist()
        idxs = g["turn_idx"].tolist()
        kept: list[int] = []
        total = 0
        for i in range(len(lines) - 1, -1, -1):
            add = len(lines[i]) + (1 if kept else 0)
            if total + add > budget:
                break
            total += add
            kept.append(i)
        kept.reverse()
        rows.append(
            {
                "conv_id": conv_id,
                "n_turns_kept": len(kept),
                "start_turn_idx": idxs[kept[0]] if kept else -1,
                "n_chars_kept": sum(len(lines[i]) for i in kept),
                "context": "\n".join(lines[i] for i in kept),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_turns_kept", "start_turn_idx", "n_chars_kept"):
        out[c] = out[c].astype("int64")
    return out


@pytest.fixture(scope="module")
def ctx(ray_session):
    import __ray_entry__ as entrymod
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(SF)
    got = (
        entrymod.queries()["t_context_suffix"](SF)
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    return got, straight_context_suffix(path, BUDGET)


def test_exact_parity(ctx):
    got, ref = ctx
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )


def test_mix_is_nontrivial(ctx):
    got, _ = ctx
    # the 4096 budget must actually exercise both branches on the fixture:
    # some conversations fully kept, some truncated
    full = (got["start_turn_idx"] == 0).sum()
    assert 0 < full < len(got)
    assert (got["n_chars_kept"] <= BUDGET).all()


def test_suffix_is_maximal(ctx):
    got, _ = ctx
    # maximality: adding ONE more turn would overflow — cross-check via the
    # rendered context length (chars + separators) being within budget while
    # n_chars_kept + separators + (any earlier line) necessarily exceeds it.
    # Cheap proxy checked exactly in the straight-line parity; here assert
    # rendered length consistency: len(context) == n_chars_kept + n_kept - 1
    nonempty = got[got["n_turns_kept"] > 0]
    assert (
        nonempty["context"].str.len()
        == nonempty["n_chars_kept"] + nonempty["n_turns_kept"] - 1
    ).all()


def test_tiny_budget_zero_kept(ray_session):
    # engine semantics under an adversarial budget: conversations whose
    # final rendered turn alone exceeds the budget emit 0 turns / -1 start
    import __ray_entry__ as entrymod

    got = entrymod.queries()["t_context_suffix"](SF, budget=8).to_pandas()
    zero = got[got["n_turns_kept"] == 0]
    assert (zero["start_turn_idx"] == -1).all()
    assert (zero["n_chars_kept"] == 0).all()
    assert (zero["context"] == "").all()
    kept = got[got["n_turns_kept"] > 0]
    assert (kept["n_chars_kept"] + kept["n_turns_kept"] - 1 <= 8).all()
