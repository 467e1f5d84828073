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


@pytest.mark.slow
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


def test_partition_selection():
    from blackbox_tpu.orchestration.cluster import (SlurmSettings,
                                                    partition_for)
    s = SlurmSettings(partition_default="deflt", partition_cal="p1gb8",
                      partition_sci="p4gb16t",
                      partition_sci_dense="p8gb32t",
                      partition_sci_vdense="p16gb64t")
    assert partition_for("bias", None, s) == "p1gb8"
    assert partition_for("flat", 9e9, s) == "p1gb8"
    assert partition_for("object", None, s) == "p4gb16t"
    assert partition_for("object", 3e5, s) == "p8gb32t"
    assert partition_for("object", 2e6, s) == "p16gb64t"
    # unset partitions fall back to the default
    assert partition_for("object", 3e5, SlurmSettings(
        partition_default="d")) == "d"


def test_night_chain_order(tmp_path):
    # fake night: frame jobs drain, then masters -> (wait) -> headkeys
    # -> obslog, submitted in order with per-telescope job trees
    from blackbox_tpu.orchestration.cluster import (SlurmRunner,
                                                    SlurmSettings,
                                                    run_night_chain)
    submitted = []
    states = {}

    def fake_submit(script):
        jid = f"j{len(submitted)}"
        with open(script) as fh:
            submitted.append((jid, script, fh.read()))
        states[jid] = "COMPLETED"
        return jid

    r = SlurmRunner(str(tmp_path), SlurmSettings(reservation="night"),
                    submit_fn=fake_submit,
                    state_fn=lambda j: states.get(j, "COMPLETED"))
    r.submit_image(str(tmp_path / "ML1_x.fits"), "ML1", ngaia=3e5,
                   imgtype="object")
    r.wait_all(poll_s=0.01)
    names = run_night_chain(r, "20260401", "ML1", poll_s=0.01)
    assert names[0] == "masters_20260401"
    assert names[-1] == "obslog_20260401"
    assert [n for n in names if n.startswith("add_headkeys")] == [
        f"add_headkeys_{k}_20260401"
        for k in ("cat", "trans", "sso", "bias", "flat")]
    # scripts land in the per-telescope tree and carry the reservation
    assert all("/ML1/" in s[1] for s in submitted)
    assert all("--reservation=night" in s[2] for s in submitted)
    # chain order: masters submitted before every headkeys job
    order = [s[1] for s in submitted]
    assert order.index(str(tmp_path / "jobs/ML1/masters_20260401.sh")) \
        < order.index(
            str(tmp_path / "jobs/ML1/add_headkeys_cat_20260401.sh"))


def test_add_night_headkeys(tmp_path, rng):
    import numpy as np
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.io.fits import Header, write_image
    from blackbox_tpu.io.rice import write_rice
    from blackbox_tpu.orchestration.headertable import (
        add_night_headkeys, query)
    from blackbox_tpu.orchestration.paths import DataTree
    tree = DataTree(str(tmp_path), "ML1")
    date = "20260401"
    rdir = tree.red_dir(date, "flat")
    import os
    os.makedirs(rdir, exist_ok=True)
    h = Header()
    h["MJD-OBS"] = 61131.2; h["DATE-OBS"] = "2026-04-01T04:48:00"
    h["FILTER"] = "q"; h["MEDSEC"] = 30000.0; h["RSTDSEC"] = 0.01
    h["QC-FLAG"] = "green"
    H, W = TINY.red_shape
    write_rice(os.path.join(rdir, "ML1_f0_red.fits.fz"),
               rng.normal(3e4, 50, (H, W)).astype(np.float32), h)
    add_night_headkeys(str(tmp_path), "ML1", "flat", date)
    rows = query(tree, "ML1", "flat", FILTER="q")
    assert len(rows) == 1
    assert abs(float(rows[0]["MEDSEC"]) - 30000.0) < 1e-3


def test_cli_read_path_filters_and_genlog(tmp_path, capsys):
    # --read_path + --recursive list a nested alternative input dir;
    # --imgtypes drops non-matching frames before reduction;
    # --name_genlog attaches a general log file (blackbox.py:220-248)
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.synth.observation import write_observation
    from blackbox_tpu.__main__ import main
    from blackbox_tpu.astro.time import iso2mjd

    rng = np.random.default_rng(3)
    tree_root = str(tmp_path)
    stage = os.path.join(tree_root, "staging", "deep", "nested")
    raw = os.path.join(stage, "ML1_20260305_231000.fits")
    write_observation(raw, TINY, rng, "bias",
                      mjd_start=iso2mjd("2026-03-05T23:10:00.000"))

    genlog = os.path.join(tree_root, "general.log")
    rc = main(["--data_root", tree_root, "--geometry", "tiny",
               "--mode", "day", "--date", "20260305",
               "--read_path", os.path.join(tree_root, "staging"),
               "--recursive", "true", "--imgtypes", "flat",
               "--name_genlog", genlog])
    assert rc == 0
    # the only frame is a bias; the flat-only selection drops it
    assert "processed=0" in capsys.readouterr().out
    # bare-directory name_genlog landed exactly where asked
    assert os.path.exists(genlog)
    assert "genlogfile created" in open(genlog).read()
    # non-recursive listing of the same read_path finds nothing
    rc = main(["--data_root", tree_root, "--geometry", "tiny",
               "--mode", "day", "--date", "20260305",
               "--read_path", os.path.join(tree_root, "staging")])
    assert rc == 0
    assert "processed=0" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_read_path_processes_matching(tmp_path, capsys):
    # the recursive read_path run reduces the bias it finds, and the
    # date derives from a raw/yyyy/mm/dd-shaped read_path tail
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.synth.observation import write_observation
    from blackbox_tpu.__main__ import main
    from blackbox_tpu.astro.time import iso2mjd

    rng = np.random.default_rng(4)
    tree_root = str(tmp_path)
    alt = os.path.join(tree_root, "incoming", "2026", "03", "05")
    raw = os.path.join(alt, "ML1_20260305_231500.fits")
    write_observation(raw, TINY, rng, "bias",
                      mjd_start=iso2mjd("2026-03-05T23:15:00.000"))

    rc = main(["--data_root", tree_root, "--geometry", "tiny",
               "--mode", "day", "--read_path", alt,
               "--imgtypes", "bias"])
    assert rc == 0
    assert "processed=1" in capsys.readouterr().out
    red = os.path.join(tree_root, "ML1", "red", "2026", "03", "05",
                       "bias", "ML1_20260305_231500_red.fits.fz")
    assert os.path.exists(red)
