#!/usr/bin/env python3
"""Host-health preflight for seals and benchaudit: a fixed set of
hardware-level micro-benchmarks with a stored quiet-box reference, so
"controls say degraded" gets an attributable magnitude independent of
Spark/sbt (VERDICT r16 ask #4).

Probes:
  py_md5_1c   — single-core Python md5 throughput (CPU integer/hash)
  py_md5_32c  — 32-process scaling efficiency (oversubscription / HT)
  jvm_loop    — a small single-thread JVM arithmetic loop, fresh java
                (JIT + JVM path; the thing Spark actually runs on)
  fault_gbps  — fresh-page-touch throughput (hypervisor page-alloc
                path; healthy >1 GB/s, degraded ~0.07 GB/s)
  pingpong_us — cross-thread futex wake roundtrip (host vCPU
                scheduling; healthy 5-20us, degraded ~60us)
  steal_pct   — /proc/stat steal share over the measurement window
  cpu_mhz     — nominal frequency (fixed 2100 in this guest; recorded
                for the day it changes)

The last two discriminate the r15/r16 degradation episodes: on
2026-08-16 18:00 the box ran Spark controls 1.8-2.2x above seal rows
while CPU/JVM-loop/scaling probes were ALL healthy — the degraded
paths were fresh page faults (0.07 GB/s, ~60us per 4KB page) and
cross-core thread wakes (60.7us/roundtrip), i.e. host-side vCPU
oversubscription + ballooned-memory faults. Sync-heavy 32-thread
Spark stages stall on both; register-bound loops see neither. Guest
steal% stays ~0 because the vCPU isn't RUNNING while descheduled.
Not guest-fixable (AlwaysPreTouch was tested and does NOT restore
warm times — the steady-state cost is wake latency, not heap
faults).

Every run appends a row to tools/hostcheck_history.jsonl. If
tools/hostcheck_ref.json exists (written with --set-ref on a box whose
q76/q303 controls passed <=1.4x), the exit code encodes health:
  0 = all probes within 1.4x of reference
  3 = degraded (any probe >1.4x slower) — matches benchaudit's
      box-degraded exit so seal.py can share the convention.

"""
import json, os, subprocess, sys, time, hashlib, tempfile
import threading
import multiprocessing as mp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "tools", "hostcheck_history.jsonl")
REF = os.path.join(REPO, "tools", "hostcheck_ref.json")

JAVA_SRC = """
public class HostCheckLoop {
  public static void main(String[] a) {
    long t0 = System.nanoTime();
    // mixed int/long/double loop, deliberately JIT-friendly: measures
    // the warmed JVM execution path, not interpreter startup.
    double acc = 0; long x = 1;
    for (int r = 0; r < 5; r++) {
      for (int i = 1; i < 20_000_000; i++) {
        x = x * 6364136223846793005L + 1442695040888963407L;
        acc += (x >>> 33) * 1.0e-9;
        if ((i & 0xFFFFF) == 0) acc = acc % 1e9;
      }
    }
    long dt = System.nanoTime() - t0;
    System.out.println("JVMLOOP_SEC " + (dt / 1e9) + " " + acc);
  }
}
"""


def _md5_work(n):
    buf = b"x" * 1024
    for _ in range(n):
        hashlib.md5(buf)
    return n


def read_stat():
    f = open("/proc/stat").readline().split()
    vals = list(map(int, f[1:]))
    return sum(vals), vals[7] if len(vals) > 7 else 0  # total, steal


def probe_python():
    t0 = time.perf_counter()
    _md5_work(200000)
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with mp.Pool(32) as p:
        p.map(_md5_work, [200000] * 32)
    multi = time.perf_counter() - t0
    eff = (single * 32 / multi) / 32
    return single, multi, eff


def probe_jvm():
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "HostCheckLoop.java")
        open(src, "w").write(JAVA_SRC)
        # single-file source launch: javac not needed (Java 11+)
        out = subprocess.run(["java", src], capture_output=True, text=True,
                             timeout=300)
        for line in out.stdout.splitlines():
            if line.startswith("JVMLOOP_SEC"):
                return float(line.split()[1])
    return None


def probe_fault_gbps():
    # touch 256 MB of fresh anonymous mmap, one byte per 4KB page —
    # measures the hypervisor page-allocation fault path. A plain
    # ctypes/calloc buffer does NOT work here (the allocator hands
    # back already-faulted arena pages); anonymous mmap guarantees
    # every touch is a fresh fault.
    import mmap as _mmap
    n = 256 * 1024 * 1024
    m = _mmap.mmap(-1, n)
    t0 = time.perf_counter()
    step = 4096
    for i in range(0, n, step):
        m[i] = 1
    dt = time.perf_counter() - t0
    m.close()
    return (n / dt) / 1e9


def probe_pingpong_us(rounds=20000):
    e1, e2 = threading.Event(), threading.Event()

    def other():
        for _ in range(rounds):
            e1.wait()
            e1.clear()
            e2.set()

    t = threading.Thread(target=other, daemon=True)
    t.start()
    t0 = time.perf_counter()
    for _ in range(rounds):
        e1.set()
        e2.wait()
        e2.clear()
    return (time.perf_counter() - t0) / rounds * 1e6


def main():
    set_ref = "--set-ref" in sys.argv
    tot0, steal0 = read_stat()
    mhz = 0.0
    for line in open("/proc/cpuinfo"):
        if line.startswith("cpu MHz"):
            mhz = float(line.split(":")[1])
            break
    py1, py32, eff = probe_python()
    jvm = probe_jvm()
    fault = probe_fault_gbps()
    pingpong = probe_pingpong_us()
    tot1, steal1 = read_stat()
    steal_pct = 100.0 * (steal1 - steal0) / max(1, tot1 - tot0)
    load1 = float(open("/proc/loadavg").read().split()[0])
    row = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "py_md5_1c_sec": round(py1, 3),
        "py_md5_32c_sec": round(py32, 3),
        "py_scaling_eff": round(eff, 3),
        "jvm_loop_sec": round(jvm, 3) if jvm is not None else None,
        "fault_gbps": round(fault, 3),
        "pingpong_us": round(pingpong, 1),
        "steal_pct": round(steal_pct, 3),
        "cpu_mhz": mhz,
        "load_avg": load1,
    }
    with open(HIST, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row, indent=2))

    if set_ref:
        open(REF, "w").write(json.dumps(row, indent=2) + "\n")
        print(f"reference written to {REF}")
        return 0

    if not os.path.exists(REF):
        print("no quiet-box reference yet (run --set-ref when controls "
              "pass <=1.4x); recorded history only")
        return 0

    ref = json.load(open(REF))
    degraded = []
    # explicit None checks, NOT truthiness: a probe so degraded it
    # rounds to 0.0 (fault_gbps) must trip the gate, not dodge it,
    # and a probe that FAILED to run (jvm_loop None — java crashing
    # is itself a degradation signal) must count as degraded.
    for k in ("py_md5_1c_sec", "jvm_loop_sec", "pingpong_us"):
        if ref.get(k) is None:
            continue
        if row.get(k) is None:
            degraded.append(f"{k}: probe FAILED (ref {ref[k]})")
        elif row[k] > 1.4 * ref[k]:
            degraded.append(f"{k}: {row[k]} vs ref {ref[k]}")
    for k in ("py_scaling_eff", "fault_gbps"):
        if ref.get(k) is None:
            continue
        if row.get(k) is None:
            degraded.append(f"{k}: probe FAILED (ref {ref[k]})")
        elif row[k] < 0.7 * ref[k]:
            degraded.append(f"{k}: {row[k]} vs ref {ref[k]}")
    if degraded:
        print("DEGRADED:\n  " + "\n  ".join(degraded))
        return 3
    print("host healthy vs reference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
