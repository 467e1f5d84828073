"""Cluster adapters: SLURM job generation + state polling.

Rebuild of the reference's SLURM drivers
(/root/reference/blackbox_slurm_ilifu.py:87-528,
blackbox_slurm_google.py:117-681) as a thin host layer: one job per
frame, resources scaled by the field's expected source density (the
ilifu driver scales threads 2→8 at Gaia counts 2e5/5e5/1e6; the Google
driver picks partitions), a ``wait4jobs2finish`` sacct poll, and
end-of-night master/obslog/header-table jobs.  The per-job payload runs
this framework's CLI instead of a Singularity container.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import time
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class SlurmSettings:
    partition_default: str = "tpu"
    runtime: str = "6:00:00"           # reference default wall budget
    job_dir: str = "jobs"
    python: str = "python"
    # expected-source-count thresholds -> cpus (ilifu 221-257 parity)
    ngaia_thresholds: tuple = (2e5, 5e5, 1e6)
    cpus_by_density: tuple = (2, 4, 6, 8)
    mem_per_cpu_gb: int = 7


def cpus_for_field(ngaia: Optional[float],
                   s: SlurmSettings = SlurmSettings()) -> int:
    if ngaia is None:
        return s.cpus_by_density[1]
    k = sum(ngaia > t for t in s.ngaia_thresholds)
    return s.cpus_by_density[k]


def sbatch_script(image_path: str, telescope: str, job_name: str,
                  log_path: str, s: SlurmSettings = SlurmSettings(),
                  ngaia: Optional[float] = None,
                  extra_args: str = "") -> str:
    cpus = cpus_for_field(ngaia, s)
    return f"""#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --partition={s.partition_default}
#SBATCH --time={s.runtime}
#SBATCH --cpus-per-task={cpus}
#SBATCH --mem={cpus * s.mem_per_cpu_gb}G
#SBATCH --output={log_path}

{s.python} -m blackbox_tpu --telescope {telescope} \\
    --image {image_path} {extra_args}
"""


class SlurmRunner:
    """Submit + track per-frame jobs (sbatch/sacct wrappers).

    ``submit_fn``/``state_fn`` are injectable for testing and for
    non-SLURM clusters with compatible semantics.
    """

    ACTIVE = {"PENDING", "RUNNING", "CONFIGURING", "COMPLETING",
              "REQUEUED", "RESIZING", "SUSPENDED",
              # a failed node is retried by SLURM; still active
              # (reference counts NODE_FAIL as active, google:578)
              "NODE_FAIL"}

    def __init__(self, workdir: str, settings: SlurmSettings =
                 SlurmSettings(), submit_fn=None, state_fn=None):
        self.workdir = workdir
        self.s = settings
        self.jobs = {}                     # job_id -> job_name
        self._submit = submit_fn or self._sbatch
        self._state = state_fn or self._sacct

    def _sbatch(self, script_path: str) -> str:
        out = subprocess.run(["sbatch", script_path],
                             capture_output=True, text=True, check=True)
        return out.stdout.strip().split()[-1]      # "Submitted ... <id>"

    def _sacct(self, job_id: str) -> str:
        out = subprocess.run(
            ["sacct", "-j", job_id, "--format=State", "--noheader",
             "-X"], capture_output=True, text=True)
        return (out.stdout.split() or ["UNKNOWN"])[0]

    def submit_image(self, image_path: str, telescope: str,
                     ngaia: Optional[float] = None,
                     extra_args: str = "") -> str:
        base = os.path.splitext(os.path.basename(image_path))[0]
        jdir = os.path.join(self.workdir, self.s.job_dir)
        os.makedirs(jdir, exist_ok=True)
        script = os.path.join(jdir, base + ".sh")
        log = os.path.join(jdir, base + ".out")
        with open(script, "w") as fh:
            fh.write(sbatch_script(image_path, telescope, base, log,
                                   self.s, ngaia, extra_args))
        job_id = self._submit(script)
        self.jobs[job_id] = base
        return job_id

    def n_active(self) -> int:
        return sum(self._state(j) in self.ACTIVE for j in self.jobs)

    def wait_all(self, poll_s: float = 30.0,
                 timeout_s: Optional[float] = None):
        """sacct-poll until every submitted job left the active states
        (reference wait4jobs2finish)."""
        t0 = time.time()
        while self.n_active() > 0:
            if timeout_s is not None and time.time() - t0 > timeout_s:
                raise TimeoutError(
                    f"{self.n_active()} SLURM jobs still active")
            time.sleep(poll_s)
        return {j: self._state(j) for j in self.jobs}


def collect_job_logs(workdir: str, dest: str,
                     s: SlurmSettings = SlurmSettings()) -> str:
    """Concatenate per-job logs into one night log (ilifu 370-380)."""
    import glob
    jdir = os.path.join(workdir, s.job_dir)
    parts = []
    for p in sorted(glob.glob(os.path.join(jdir, "*.out"))):
        parts.append(f"===== {os.path.basename(p)} =====\n")
        try:
            with open(p) as fh:
                parts.append(fh.read())
        except OSError:
            parts.append("<unreadable>\n")
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "w") as fh:
        fh.write("".join(parts))
    return dest
