#!/usr/bin/env python
"""One-command round health check: run exactly what the driver will run.

Executes (1) the headline bench leg and (2) the budget-bounded multi-chip
dryrun in fresh subprocesses, each under the same hard deadline the driver
applies, and prints the two JSON records the driver would capture
(BENCH_rN.json / MULTICHIP_rN.json shapes). Exits nonzero if either would
be recorded as a failure — so a round can't again ship an artifact that
dies only under the driver (round-3 bench rc=124, round-4 dryrun rc=124).

Usage:
    python scripts/preflight.py               # both checks
    python scripts/preflight.py --bench-only  # skip the dryrun
    python scripts/preflight.py --dryrun-only # skip the bench
Env:
    PREFLIGHT_BENCH_TIMEOUT_S   (default 3600 — bench's own child
                                 deadlines fire first; this is a backstop)
    PREFLIGHT_DRYRUN_TIMEOUT_S  (default 600 — the driver's timeout;
                                 DRYRUN_BUDGET_S inside must undercut it)
    PREFLIGHT_N_DEVICES         (default 8)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_capture(cmd, timeout_s, env=None):
    """Run cmd streaming stdout through, with a hard deadline; return
    (rc, lines). rc=124 on deadline (matching the driver's timeout(1)).

    The child starts in its own process GROUP and the deadline kills the
    whole group: bench.py is a supervisor whose BENCH_CHILD grandchild
    inherits our pipe — killing only the supervisor would orphan a hung
    grandchild holding the write end and the read loop would never see
    EOF (the exact wedged-axon scenario preflight exists to catch)."""
    import signal

    p = subprocess.Popen(cmd, cwd=ROOT, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, bufsize=1,
                         start_new_session=True)
    assert p.stdout is not None
    lines = []
    deadline = time.monotonic() + timeout_s
    import threading

    def killer():
        while p.poll() is None:
            if time.monotonic() > deadline:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    p.kill()
                return
            time.sleep(1.0)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    for ln in p.stdout:
        ln = ln.rstrip("\n")
        lines.append(ln)
        print(f"  | {ln}", flush=True)
    rc = p.wait()
    if rc != 0 and time.monotonic() > deadline:
        rc = 124
    return rc, lines


def check_bench() -> bool:
    timeout_s = float(os.environ.get("PREFLIGHT_BENCH_TIMEOUT_S", "3600"))
    print(f"preflight: bench (deadline {timeout_s:.0f}s)...", flush=True)
    rc, lines = run_capture([sys.executable, "bench.py"], timeout_s)
    last = None
    for ln in lines:
        if ln.startswith("{"):
            last = ln
    parsed = None
    if last:
        try:
            parsed = json.loads(last)
        except json.JSONDecodeError:
            pass
    record = {"rc": rc, "parsed": parsed}
    ok = rc == 0 and parsed is not None and parsed.get("value", 0) > 0
    print(f"preflight BENCH record: {json.dumps(record)}", flush=True)
    print(f"preflight bench: {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def check_dryrun() -> bool:
    timeout_s = float(os.environ.get("PREFLIGHT_DRYRUN_TIMEOUT_S", "600"))
    n_dev = int(os.environ.get("PREFLIGHT_N_DEVICES", "8"))
    print(f"preflight: dryrun_multichip({n_dev}) "
          f"(deadline {timeout_s:.0f}s)...", flush=True)
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        # same guard as __graft_entry__: a pre-existing count must not be
        # duplicated (XLA's duplicate-flag resolution is unspecified)
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONUNBUFFERED", "1")
    rc, lines = run_capture(
        [sys.executable, "__graft_entry__.py", str(n_dev)], timeout_s, env)
    tail = "\n".join(lines[-20:])
    record = {"n_devices": n_dev, "rc": rc, "ok": rc == 0}
    print(f"preflight MULTICHIP record: {json.dumps(record)}", flush=True)
    print(f"preflight dryrun: {'OK' if rc == 0 else 'FAIL'} "
          f"({sum('OK' in ln for ln in lines)} paths green, "
          f"{sum('skipped: budget' in ln for ln in lines)} budget-skipped)",
          flush=True)
    if rc != 0:
        print(tail, flush=True)
    return rc == 0


def main() -> int:
    args = sys.argv[1:]
    if "--bench-only" in args and "--dryrun-only" in args:
        print("preflight: --bench-only and --dryrun-only are mutually "
              "exclusive (together they would verify nothing)",
              file=sys.stderr)
        return 2
    ok = True
    if "--dryrun-only" not in args:
        ok = check_bench() and ok
    if "--bench-only" not in args:
        ok = check_dryrun() and ok
    print(f"preflight: {'ALL OK' if ok else 'FAILED'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
