"""Ship mechanism (north rule): package the engine for spark-submit.

Builds dist/engine.zip containing the datachecker_spark package and prints
the spark-submit command. The job entry (tools/submit_job.py) imports the
engine from the zip exactly as a cluster executor would — the same artifact
submits unchanged to a real multi-executor cluster:

  spark-submit --py-files dist/engine.zip tools/submit_job.py \
      --input <docs.parquet> --output <out_dir>

Usage: python tools/package.py [--check]   (--check: also run a local
spark-submit smoke job over a generated corpus)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "engine.zip")
    pkg = os.path.join(REPO, "datachecker_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    out = build_zip()
    print(f"built {out}")
    print(
        f"submit: spark-submit --py-files {out} "
        f"{os.path.join(REPO, 'tools', 'submit_job.py')} --docs 2000"
    )
    if args.check:
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        r = subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--py-files", out,
                os.path.join(REPO, "tools", "submit_job.py"),
                "--docs", "2000",
            ],
            env=env, cwd="/tmp", capture_output=True, text=True, timeout=600,
        )
        ok = "SUBMIT_JOB_OK" in r.stdout
        print("smoke:", "OK" if ok else "FAIL")
        if not ok:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
            sys.exit(1)


if __name__ == "__main__":
    main()
