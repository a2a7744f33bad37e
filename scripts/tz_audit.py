#!/usr/bin/env python3
"""Host-timezone invariance audit: every registry query must produce
the IDENTICAL canonical result regardless of the HOST timezone of the
machine running it.

The engine pins ``spark.sql.session.timeZone=UTC`` (session.py), and
``operators/temporal.py`` documents that NTZ->TIMESTAMP conversions
assume that fixed-offset session zone. What that contract does NOT
automatically guarantee is independence from the *host* zone — the JVM
``user.timezone`` and the Python/C ``TZ`` — which on a real fleet
varies per machine. Leak classes this audit catches:

  - Python ``datetime.fromtimestamp`` / naive ``datetime.now`` usage
    inside pandas UDFs (localtime-dependent);
  - pandas/Arrow timestamp conversions that consult the process zone;
  - JVM default-zone leaking into legacy parquet timestamp rebase or
    into string<->timestamp casts that bypass the session zone.

Pass A runs with the inherited host environment; pass B pins
``TZ=Pacific/Kiritimati`` (UTC+14 — the largest offset on Earth, no
DST) into the C library, Python, and the JVM (-Duser.timezone). Each
pass is its own subprocess (fresh JVM); the parent diffs canonical
result hashes and writes TZ_AUDIT.json. Exit nonzero on divergence.

Usage:
    python scripts/tz_audit.py [sf_dir]           # full registry
    python scripts/tz_audit.py [sf_dir] q1 q2...  # subset
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_FAR_TZ = "Pacific/Kiritimati"  # UTC+14, no DST


def _run_pass(which: str, sf_dir: str, names: list[str], out_path: str) -> None:
    if which == "B":
        os.environ["TZ"] = _FAR_TZ
        time.tzset()
    from mlentory_etl_pipeline_spark.plans.queries import REGISTRY
    from mlentory_etl_pipeline_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from check_correctness import spark_canonical_sorted_rows  # noqa: E402

    extra = {}
    if which == "B":
        extra = {
            "spark.driver.extraJavaOptions": f"-Duser.timezone={_FAR_TZ}",
            # local mode: driver JVM == executor JVM, but keep both for
            # cluster parity of the audit definition
            "spark.executor.extraJavaOptions": f"-Duser.timezone={_FAR_TZ}",
        }
    spark = get_spark(f"tz-audit-{which}", extra_conf=extra)
    if which == "B":
        # assert the perturbation actually took in the JVM
        jvm_tz = spark._jvm.java.util.TimeZone.getDefault().getID()
        assert jvm_tz == _FAR_TZ, f"JVM zone is {jvm_tz}, expected {_FAR_TZ}"
    out: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            rows = spark_canonical_sorted_rows(
                REGISTRY[name].spark_fn(spark, sf_dir)
            )
            h = hashlib.md5("\n".join(rows).encode()).hexdigest()
            out[name] = {"rows": len(rows), "hash": h}
        except Exception as e:  # recorded, compared as error-vs-error
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"  [{which}] {name} ({time.time() - t0:.1f}s)", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--pass":
        _run_pass(sys.argv[2], sys.argv[3], json.loads(sys.argv[5]), sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from mlentory_etl_pipeline_spark.plans.queries import REGISTRY

    names = sys.argv[2:] or list(REGISTRY)
    results = {}
    for which in ("A", "B"):
        out_path = f"/tmp/tz_audit_{which}.json"
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--pass",
                which,
                sf_dir,
                out_path,
                json.dumps(names),
            ],
            check=True,
        )
        results[which] = json.load(open(out_path))
    diverged = []
    for name in names:
        a, b = results["A"].get(name), results["B"].get(name)
        if a != b:
            diverged.append({"query": name, "A": a, "B": b})
    artifact = {
        "metric": "tz_audit",
        "sf_dir": sf_dir,
        "audited": len(names),
        "diverged": diverged,
        "pass_b_tz": _FAR_TZ,
    }
    with open(os.path.join(REPO, "TZ_AUDIT.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "tz_audit", "audited": len(names),
                      "n_diverged": len(diverged)}))
    if diverged:
        for d in diverged[:10]:
            print("DIVERGED:", d["query"], d["A"], d["B"])
        sys.exit(1)


if __name__ == "__main__":
    main()
