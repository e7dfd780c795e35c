"""CLI — `python -m neurondb_tpu <command>`.

Service entry points matching the reference's binaries (neurondb-mcp,
agent-server) plus engine utilities.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="neurondb_tpu",
                                description="TPU-native vector search + ML")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("mcp", help="MCP stdio JSON-RPC server")

    sp = sub.add_parser("rest", help="REST agent/search server")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8080)

    sp = sub.add_parser("metrics", help="Prometheus exporter")
    sp.add_argument("--port", type=int, default=None)

    sp = sub.add_parser("config", help="show effective configuration")

    sp = sub.add_parser("algorithms", help="list ML algorithms")

    sp = sub.add_parser("devices", help="show accelerator devices")

    args = p.parse_args(argv)

    if args.cmd == "mcp":
        from neurondb_tpu.service.mcp import MCPServer
        MCPServer().serve_stdio()
    elif args.cmd == "rest":
        import time
        from neurondb_tpu.service.rest import RESTServer
        srv = RESTServer(host=args.host, port=args.port)
        port = srv.start()
        print(f"REST server on {args.host}:{port}", flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
    elif args.cmd == "metrics":
        import time
        from neurondb_tpu.service.metrics import PrometheusExporter
        exp = PrometheusExporter(port=args.port)
        port = exp.start()
        print(f"Prometheus exporter on :{port}/metrics", flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            exp.stop()
    elif args.cmd == "config":
        from neurondb_tpu.config import get_config
        print(json.dumps(get_config().as_dict(), indent=2))
    elif args.cmd == "algorithms":
        from neurondb_tpu.ml.api import list_algorithms
        print("\n".join(list_algorithms()))
    elif args.cmd == "devices":
        import jax
        for d in jax.devices():
            print(d)


if __name__ == "__main__":
    main()
