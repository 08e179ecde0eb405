"""Checkpoint-snapshot restore used by bench.py.

Only git-tracked files survive a machine rebuild between builder sessions;
scripts/snapshot_artifacts.sh archives trained run dirs into artifacts/
and bench.py._restore_artifact_snapshots unpacks them when the live
output/ dirs are absent (so the driver's end-of-round bench measures
trained weights, not a random re-init)."""

import os
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_restore():
    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._restore_artifact_snapshots


def _make_run(root, name):
    run = os.path.join(root, name, "checkpoints")
    os.makedirs(run)
    with open(os.path.join(run, "weights.bin"), "wb") as f:
        f.write(b"\x01\x02\x03")
    return os.path.join(root, name)


def test_restore_unpacks_missing_runs(tmp_path):
    restore = _load_restore()
    src = tmp_path / "src"
    art = tmp_path / "artifacts"
    ckpt_root = tmp_path / "out"
    os.makedirs(art)
    _make_run(str(src), "mse_640")
    with tarfile.open(art / "mse_640.tar.gz", "w:gz") as t:
        t.add(src / "mse_640", arcname="mse_640")

    restore(str(ckpt_root), art_dir=str(art))
    assert (ckpt_root / "mse_640" / "checkpoints" / "weights.bin").is_file()


def test_restore_never_clobbers_live_dirs(tmp_path):
    restore = _load_restore()
    art = tmp_path / "artifacts"
    ckpt_root = tmp_path / "out"
    os.makedirs(art)
    live = _make_run(str(ckpt_root), "mse_640")
    marker = os.path.join(live, "checkpoints", "weights.bin")
    with open(marker, "wb") as f:
        f.write(b"live")  # differs from any tarball content

    stale = tmp_path / "stale"
    _make_run(str(stale), "mse_640")
    with tarfile.open(art / "mse_640.tar.gz", "w:gz") as t:
        t.add(stale / "mse_640", arcname="mse_640")

    restore(str(ckpt_root), art_dir=str(art))
    with open(marker, "rb") as f:
        assert f.read() == b"live"


def test_restore_tolerates_bad_tarball(tmp_path):
    restore = _load_restore()
    art = tmp_path / "artifacts"
    os.makedirs(art)
    with open(art / "mse_640.tar.gz", "wb") as f:
        f.write(b"not a tarball")
    restore(str(tmp_path / "out"), art_dir=str(art))  # must not raise


def test_snapshot_script_roundtrip(tmp_path):
    """snapshot_artifacts.sh output is consumable by the restore helper."""
    # The script works on the repo's real output/rd_round4; exercise only
    # its tar layout contract here (arcname = run dir name) without
    # touching repo state: emulate its tar invocation.
    restore = _load_restore()
    src = tmp_path / "rd_round4"
    _make_run(str(src), "image_mse_640")
    art = tmp_path / "artifacts"
    os.makedirs(art)
    subprocess.run(
        ["tar", "czf", str(art / "image_mse_640.tar.gz"),
         "-C", str(src), "image_mse_640"],
        check=True,
    )
    out = tmp_path / "restored"
    restore(str(out), art_dir=str(art))
    assert (out / "image_mse_640" / "checkpoints" / "weights.bin").is_file()
