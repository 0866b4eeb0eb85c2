"""Exercise the DCN bootstrap for real (VERDICT r4 #9).

Runs scripts/run_multihost.py twice on this machine:

1. single process, one 8-device virtual CPU mesh (the baseline), and
2. TWO actual OS processes, 4 virtual CPU devices each, joined into
   one 8-device global runtime via ``jax.distributed.initialize``
   (process 0 is the coordinator; collectives cross the process
   boundary over gRPC — the same wire path a DCN slice uses),

with the same (2, 3) mesh (the largest divisor of the 102-point
grid; 6 of the 8 devices participate, spanning the process boundary)
and step count, then asserts the global mesh
formed (2 processes x 4 local = 8 global devices) and the final-state
checksums agree, and writes MULTIHOST_r05.json.

Usage: python scripts/make_multihost_artifact.py [steps]
"""

import json
import os
import socket
import subprocess
import sys
import time

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run(cmd, out, env_extra=None, wait=True):
    env = dict(os.environ)
    # the bootstrap must not inherit the TPU tunnel: force CPU
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.Popen(cmd, env=env, stdout=open(out, "w"),
                            stderr=subprocess.STDOUT)
    return proc


def main():
    base = [sys.executable, "scripts/run_multihost.py",
            "--mesh", "2,3", "--steps", str(STEPS)]

    # ---- 1 process, 8 virtual devices -------------------------------
    p = run(base + ["--cpu-mesh", "8", "--out", "/tmp/mh_single.json"],
            "/tmp/mh_single.log")
    rc = p.wait(timeout=900)
    assert rc == 0, open("/tmp/mh_single.log").read()[-2000:]

    # ---- 2 processes x 4 virtual devices ----------------------------
    port = free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in (0, 1):
        cmd = base + ["--cpu-mesh", "4", "--coordinator", coord,
                      "--num-processes", "2", "--process-id", str(pid)]
        if pid == 0:
            cmd += ["--out", "/tmp/mh_2proc.json"]
        procs.append(run(cmd, f"/tmp/mh_2proc_{pid}.log"))
    deadline = time.time() + 900
    for pid, p in enumerate(procs):
        rc = p.wait(timeout=max(5, deadline - time.time()))
        assert rc == 0, (pid, open(f"/tmp/mh_2proc_{pid}.log")
                         .read()[-2000:])

    single = json.load(open("/tmp/mh_single.json"))
    two = json.load(open("/tmp/mh_2proc.json"))
    assert two["processes"] == 2, two
    assert two["global_devices"] == 8, two
    assert two["local_devices"] == 4, two
    # same program, same mesh: checksums must agree to f32 collective
    # reassociation tolerance
    for k in ("checksum_t0", "checksum_ke"):
        a, b = single[k], two[k]
        rel = abs(a - b) / max(abs(a), abs(b), 1e-30)
        assert rel < 1e-5, (k, a, b, rel)

    art = dict(single=single, two_process=two,
               checksum_rel_diff=dict(
                   t0=abs(single["checksum_t0"] - two["checksum_t0"])
                   / max(abs(single["checksum_t0"]), 1e-30),
                   ke=abs(single["checksum_ke"] - two["checksum_ke"])
                   / max(abs(single["checksum_ke"]), 1e-30)),
               ok=True)
    with open("MULTIHOST_r05.json", "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
