import os

import numpy as np
import pytest

from blackbox_tpu.orchestration.cluster import (
    SlurmRunner, SlurmSettings, cpus_for_field, sbatch_script,
    collect_job_logs)


def test_cpus_for_field_thresholds():
    assert cpus_for_field(None) == 4
    assert cpus_for_field(1e5) == 2
    assert cpus_for_field(3e5) == 4
    assert cpus_for_field(6e5) == 6
    assert cpus_for_field(2e6) == 8


def test_sbatch_script_contents():
    s = sbatch_script("/data/raw/f.fits", "BG2", "f", "/logs/f.out",
                      ngaia=6e5)
    assert "--cpus-per-task=6" in s
    assert "--mem=42G" in s
    assert "--time=6:00:00" in s
    assert "-m blackbox_tpu --telescope BG2" in s
    assert "--image /data/raw/f.fits" in s


def test_slurm_runner_with_fake_backend(tmp_path):
    states = {}
    n = {"i": 0}

    def submit(script_path):
        assert os.path.exists(script_path)
        n["i"] += 1
        jid = str(1000 + n["i"])
        states[jid] = ["PENDING", "RUNNING", "COMPLETED"]
        return jid

    def state(jid):
        seq = states[jid]
        return seq.pop(0) if len(seq) > 1 else seq[0]

    r = SlurmRunner(str(tmp_path), submit_fn=submit, state_fn=state)
    r.submit_image("/raw/a.fits", "ML1", ngaia=1e5)
    r.submit_image("/raw/b.fits", "ML1")
    assert r.n_active() == 2
    out = r.wait_all(poll_s=0.01)
    assert set(out.values()) == {"COMPLETED"}

    # job log collection
    jdir = tmp_path / "jobs"
    (jdir / "a.out").write_text("log A\n")
    (jdir / "b.out").write_text("log B\n")
    dest = collect_job_logs(str(tmp_path), str(tmp_path / "night.log"))
    txt = open(dest).read()
    assert "log A" in txt and "log B" in txt and "=====" in txt


def test_cli_single_image(tmp_path):
    import jax
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.synth.observation import write_observation
    from blackbox_tpu.__main__ import main, str2bool, build_parser

    assert str2bool("yes") and not str2bool("0")
    with pytest.raises(Exception):
        str2bool("maybe")

    from blackbox_tpu.astro.time import iso2mjd
    rng = np.random.default_rng(2)
    tree_root = str(tmp_path)
    raw = os.path.join(tree_root, "ML1", "raw", "2026", "03", "05",
                       "ML1_20260305_230000.fits")
    write_observation(raw, TINY, rng, "bias",
                      mjd_start=iso2mjd("2026-03-05T23:00:00.000"))

    rc = main(["--data_root", tree_root, "--image", raw,
               "--geometry", "tiny"])
    assert rc == 0
    red = os.path.join(tree_root, "ML1", "red", "2026", "03", "05",
                       "bias", "ML1_20260305_230000_red.fits.fz")
    assert os.path.exists(red)


def test_cli_requires_target():
    from blackbox_tpu.__main__ import main
    assert main(["--telescope", "ML1"]) == 2
