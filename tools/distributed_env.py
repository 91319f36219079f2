"""Multi-host environment helper (the reference's accelerator.py analogue).

The reference ships a one-shot HF Accelerate config writer
(reference accelerator.py:1-4).  The JAX equivalent needs no config file —
multi-host init is driven by environment variables — so this tool validates
and prints the environment each host needs, and can emit a template.

Usage:
  python tools/distributed_env.py            # show current/required env
  python tools/distributed_env.py --template 4 0 host0:1234
"""

from __future__ import annotations

import argparse
import os
import sys

VARS = [
    ("JAX_COORDINATOR_ADDRESS", "coordinator host:port (host 0)"),
    ("JAX_NUM_PROCESSES", "total host count"),
    ("JAX_PROCESS_ID", "this host's index"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--template", nargs=3, metavar=("NPROC", "PID", "COORD"),
                   help="print an env template for NPROC hosts")
    args = p.parse_args()

    if args.template:
        nproc, pid, coord = args.template
        print(f"export JAX_COORDINATOR_ADDRESS={coord}")
        print(f"export JAX_NUM_PROCESSES={nproc}")
        print(f"export JAX_PROCESS_ID={pid}")
        print("# then: founddiff_tpu.parallel.init_distributed() at startup")
        return

    missing = []
    for var, desc in VARS:
        val = os.environ.get(var)
        status = val if val else "<unset>"
        print(f"{var:28s} = {status:24s} # {desc}")
        if not val:
            missing.append(var)
    if missing:
        print("\nsingle-host mode (init_distributed() is a no-op).")
    else:
        print("\nmulti-host mode: init_distributed() will rendezvous.")


if __name__ == "__main__":
    main()
