#!/usr/bin/env python
"""Client for tools/tpu_agent.py: run a repo tool inside the agent's warm
TPU session (a fresh process would pay the remote backend's
session-establishment stall, measured 84 s - 31 min).

Usage: python tools/agent_run.py tools/bench_message_kernel.py --iters 5
Env:   AGENT_TIMEOUT (seconds to wait for the result; default 3600)
"""

import json
import os
import socket
import sys

SOCK = "/tmp/flowmol_tpu_agent.sock"


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(10)
    s.connect(SOCK)
    s.sendall(json.dumps({"cmd": "exec", "argv": sys.argv[1:]}).encode()
              + b"\n")
    s.settimeout(float(os.environ.get("AGENT_TIMEOUT", 3600)))
    buf = b""
    while not buf.endswith(b"\n"):
        d = s.recv(1 << 16)
        if not d:
            break
        buf += d
    if not buf.strip():
        raise SystemExit("agent returned nothing (see /tmp/tpu_agent.log)")
    res = json.loads(buf)
    sys.stdout.write(res.get("stdout", ""))
    if res.get("error"):
        sys.stderr.write(res["error"])
    sys.exit(0 if res.get("ok") else 1)


if __name__ == "__main__":
    main()
