"""Evaluation engine test: direct RAFT on synthetic constant-motion clips.

With real (converted or trained) weights this is the CVO-6 benchmark; with
random weights we only assert the protocol runs end-to-end and produces
finite EPEs and the result file."""

import os.path as osp

import numpy as np
import pytest

from accflow_tpu.data.synthetic import write_synthetic_cvor
from accflow_tpu.train.evaluate import evaluate_cvo


@pytest.mark.slow
def test_evaluate_direct_raft(tmp_path, monkeypatch):
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=1, num_test=3, h=64, w=64)
    monkeypatch.chdir(tmp_path)

    res = evaluate_cvo(
        "direct|raft", root, split="clean", batch=2, iters=2,
        compute_dtype="float32",
    )
    assert set(res) == {"all", "occ", "vis"}
    assert all(np.isfinite(v) for v in res.values())
    assert osp.exists(tmp_path / "test_result_clean_E6.txt")


@pytest.mark.slow
def test_evaluate_acc_raft(tmp_path, monkeypatch):
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=1, num_test=2, h=64, w=64)
    monkeypatch.chdir(tmp_path)
    res = evaluate_cvo(
        "acc|raft", root, split="final", batch=2, iters=2,
        compute_dtype="float32",
    )
    assert all(np.isfinite(v) for v in res.values())

    # The accumulation protocol drives raft_pairs_forward (the batched
    # serving path) — the volume-free mode must be metric-exact there too.
    res_od = evaluate_cvo(
        "acc|raft", root, split="final", batch=2, iters=2,
        compute_dtype="float32", corr_lookup="ondemand:16",
    )
    for k in res:
        np.testing.assert_allclose(res_od[k], res[k], rtol=1e-4, atol=1e-4)


def test_evaluate_direct_gma(tmp_path, monkeypatch):
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=1, num_test=2, h=64, w=64)
    monkeypatch.chdir(tmp_path)

    res = evaluate_cvo(
        "direct|gma", root, split="final", batch=2, iters=2,
        compute_dtype="float32",
    )
    assert set(res) == {"all", "occ", "vis"}
    assert all(np.isfinite(v) for v in res.values())
    assert osp.exists(tmp_path / "test_result_final_E6.txt")

    # The hi-res memory configuration (volume-free corr + chunked
    # attention) must reproduce the stored-path metrics exactly.
    res_mem = evaluate_cvo(
        "direct|gma", root, split="final", batch=2, iters=2,
        compute_dtype="float32", corr_lookup="ondemand:16", attn_chunk=16,
    )
    for k in res:
        np.testing.assert_allclose(res_mem[k], res[k], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_evaluate_micro_batch_matches_full(tmp_path, monkeypatch):
    """micro_batch splitting is metric-exact: batch 4 evaluated in
    micro-batches of 2 == one compiled call of 4. (The reference's eval
    batch of 10 at 512^2 OOMs one 16 GB chip; the default micro_batch
    heuristic splits it 5+5.)"""
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=1, num_test=5, h=64, w=64)
    monkeypatch.chdir(tmp_path)

    full = evaluate_cvo(
        "direct|raft", root, split="clean", batch=4, iters=2,
        compute_dtype="float32",
    )
    micro = evaluate_cvo(
        "direct|raft", root, split="clean", batch=4, iters=2,
        compute_dtype="float32", micro_batch=2,
    )
    for k in ("all", "occ", "vis"):
        np.testing.assert_allclose(micro[k], full[k], rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_evaluate_data_parallel_matches_single(tmp_path, monkeypatch):
    """SPMD data-parallel eval (params replicated, micro-batch sharded
    over the 8-virtual-device mesh) must reproduce the single-device
    metrics exactly — the serving scale-out path of evaluate_cvo."""
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=1, num_test=10, h=64, w=64)
    monkeypatch.chdir(tmp_path)

    kw = dict(split="clean", batch=8, micro_batch=8, iters=2,
              compute_dtype="float32")
    r_dp = evaluate_cvo("direct|raft", root, data_parallel=True, **kw)
    r_sd = evaluate_cvo("direct|raft", root, data_parallel=False, **kw)
    for k in ("all", "occ", "vis"):
        np.testing.assert_allclose(r_dp[k], r_sd[k], rtol=1e-5, atol=1e-6)
