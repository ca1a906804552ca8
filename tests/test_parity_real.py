"""scripts/parity_real.py — the turnkey real-data parity runbook.

Real CVO LMDBs and released .pth files do not exist in this environment,
so these tests validate the MACHINERY with stand-ins: the reference
result-file parser against the exact append format of
/root/reference/test_cvo.py:164-166, and an end-to-end smoke of the grid
runner (synthetic CVOR as the converted dataset, random-init .pth zoo,
two grid rows incl. the north-star row) producing the side-by-side table
with the <=1% verdict."""

import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from scripts.parity_real import GRID, ckpt_path, parse_ref_results  # noqa: E402


def test_grid_matches_reference_script():
    """16 rows = {clean,final} x the reference test_cvo.sh sequence."""
    assert len(GRID) == 16
    assert GRID[0] == ("clean", "direct", "raft", "things")
    assert GRID[4] == ("clean", "acc", "raft", "things")  # north-star row
    assert GRID[8] == ("final", "direct", "raft", "things")
    assert {g[0] for g in GRID} == {"clean", "final"}
    assert ckpt_path("d", "acc", "gma", "cvo") == osp.join("d", "acc+gma-cvo.pth")
    assert ckpt_path("d", "direct", "raft", "things") == osp.join(
        "d", "raft-things.pth"
    )


def test_parse_ref_results(tmp_path):
    """Parser vs the byte format test_cvo.py:164-166 appends."""
    path = tmp_path / "test_result_clean_E6.txt"
    with open(path, "a+") as f:
        for name, a, v, o in (
            ("direct|raft", 1.2345, 0.9, 5.5), ("acc|raft", 0.9, 0.7, 3.3),
        ):
            f.write("AVG EPE %s: \n" % name)
            f.write("all:%.4f vis:%.4f occ:%.4f \n\n" % (a, v, o))
    rows = parse_ref_results(str(path))
    assert rows == [
        ("direct|raft", 1.2345, 0.9, 5.5),
        ("acc|raft", 0.9, 0.7, 3.3),
    ]


@pytest.mark.slow
def test_parity_real_smoke(tmp_path):
    """End-to-end: rows 0 (direct|raft) and 4 (acc|raft things — the
    north-star row) over synthetic CVOR with random-init .pth files and a
    fabricated reference file -> parity_table.md with deltas + verdict."""
    torch = pytest.importorskip("torch")
    if not osp.isdir("/root/reference"):
        pytest.skip("reference tree not available")
    import _torch_ref  # noqa: F401 — sys.path + torchvision stub
    import argparse

    from networks.AccFlow_ import AccFlow
    from networks.raft.raft import RAFT

    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from scripts.parity_real import main as parity_main

    torch.manual_seed(0)
    ofe = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    torch.save(ofe.state_dict(), ckpt_dir / "raft-things.pth")
    acc = AccFlow(ofe).eval()
    torch.save(acc.state_dict(), ckpt_dir / "acc+raft-things.pth")

    out = tmp_path / "out"
    cvor = out / "cvor"
    write_synthetic_cvor(str(cvor), num_train=1, num_test=2, h=64, w=64)

    # Fabricated reference file: 8 clean entries in reference-sh order.
    ref_clean = tmp_path / "ref_clean.txt"
    with open(ref_clean, "a+") as f:
        for g in [g for g in GRID if g[0] == "clean"]:
            f.write("AVG EPE %s|%s: \n" % (g[1], g[2]))
            f.write("all:%.4f vis:%.4f occ:%.4f \n\n" % (3.0, 2.0, 9.0))

    parity_main([
        "--ckpt_dir", str(ckpt_dir), "--out", str(out),
        "--cvor_root", str(cvor), "--ref_clean", str(ref_clean),
        "--rows", "0,4", "--batch", "2", "--iters", "2",
        "--compute_dtype", "float32",
    ])

    table = open(out / "parity_table.md").read()
    assert "| clean | direct|raft | things |" in table
    assert "| clean | acc|raft | things |" in table
    assert "North star" in table
    # Random-init EPE vs the fabricated 3.0 ref will not be within 1%.
    assert "NOT MET" in table or "MET" in table
    assert osp.isfile(out / "test_result_clean_E6.txt")


@pytest.mark.slow
def test_parity_real_dry_run(tmp_path):
    """--dry_run (VERDICT r3 item #6): the runbook fabricates ALL its own
    stand-ins (synthetic CVOR, random-init .pth zoo through the reference
    torch models incl. GMA and acc+GMA, ref result files) and exercises
    the grid wiring end to end, so converter/evaluate flag drift cannot
    silently rot the one-command north-star path. Four rows here
    (raft+gma x direct+acc, clean) bound CI time; the full 16-row check
    is `python scripts/parity_real.py --dry_run --out d --ckpt_dir ''`."""
    pytest.importorskip("torch")
    if not osp.isdir("/root/reference"):
        pytest.skip("reference tree not available")

    from scripts.parity_real import main as parity_main

    out = tmp_path / "dry"
    parity_main([
        "--dry_run", "--out", str(out), "--ckpt_dir", "",
        "--rows", "0,2,4,6",
    ])
    table = open(out / "parity_table.md").read()
    for row in ("| clean | direct|raft | things |",
                "| clean | direct|gma | things |",
                "| clean | acc|raft | things |",
                "| clean | acc|gma | things |"):
        assert row in table, table
    assert "North star" in table
    # Stand-ins were fabricated where promised.
    assert osp.isdir(out / "cvor" / "test")
    for f in ("raft-things.pth", "gma-things.pth",
              "acc+raft-things.pth", "acc+gma-things.pth"):
        assert osp.isfile(out / "ckpts" / f), f
