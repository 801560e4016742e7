"""MCP server — agent-facing surface (newline-delimited JSON-RPC 2.0
over stdio, the MCP stdio transport).

Reference: python/strake/mcp.py:173-295 — tools ``search_schemas``,
``get_schema_details``, ``run_python`` (Code Mode), guard mode from
STRAKE_AGENT_GUARD_MODE. No MCP SDK is vendored here, so the protocol
loop is implemented directly: initialize / tools/list / tools/call with
MCP-shaped results ({"content": [{"type": "text", ...}]}).

Run: ``python -m strake_spark.mcp --config sources.yaml``
"""

from __future__ import annotations

import json
import sys
import traceback

PROTOCOL_VERSION = "2024-11-05"

TOOLS = [
    {
        "name": "search_schemas",
        "description": "Full-text search over registered table/column metadata.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "limit": {"type": "integer", "default": 20},
                # output-budget controls (reference python/strake/
                # mcp.py:173-196): agent callers trim or drop
                # description text without losing match/rank quality —
                # descriptions always participate in BM25 matching
                "include_descriptions": {"type": "boolean", "default": True},
                "description_scope": {
                    "type": "string",
                    "enum": ["all", "tables_only", "none"],
                    "default": "all",
                },
                "max_description_length": {"type": "integer", "default": 100},
            },
            "required": ["query"],
        },
    },
    {
        "name": "get_schema_details",
        "description": "Column names/types/nullability for one table.",
        "inputSchema": {
            "type": "object",
            "properties": {"table": {"type": "string"}},
            "required": ["table"],
        },
    },
    {
        "name": "run_python",
        "description": (
            "Execute a Python script in an OS-level sandbox. The script "
            "may call strake.sql(q) for any query listed in `queries` "
            "(pre-executed by the engine; results arrive as pandas frames)."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "script": {"type": "string"},
                "queries": {
                    "type": "array",
                    "items": {"type": "string"},
                    "description": "SQL the script will request via strake.sql",
                },
            },
            "required": ["script"],
        },
    },
]


class McpServer:
    def __init__(self, engine, guard_mode: str = "disabled") -> None:
        from strake_spark.discovery import SchemaIndex
        from strake_spark.sandbox import InjectionGuard

        self.engine = engine
        self.index = SchemaIndex(engine.spark)
        self.guard = InjectionGuard(mode=guard_mode)

    # ------------------------------------------------------------ dispatch
    def handle(self, msg: dict) -> dict | None:
        mid = msg.get("id")
        method = msg.get("method")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {"name": "strake-spark", "version": "0.1"},
                }
            elif method == "notifications/initialized":
                return None
            elif method == "tools/list":
                result = {"tools": TOOLS}
            elif method == "tools/call":
                result = self._call_tool(
                    msg["params"]["name"], msg["params"].get("arguments") or {}
                )
            elif method == "ping":
                result = {}
            else:
                return self._error(mid, -32601, f"method not found: {method}")
        except Exception as e:
            return self._error(mid, -32603, f"{type(e).__name__}: {e}")
        if mid is None:
            return None
        return {"jsonrpc": "2.0", "id": mid, "result": result}

    @staticmethod
    def _error(mid, code, message) -> dict:
        return {
            "jsonrpc": "2.0",
            "id": mid,
            "error": {"code": code, "message": message},
        }

    @staticmethod
    def _text(payload) -> dict:
        text = payload if isinstance(payload, str) else json.dumps(payload, default=str)
        return {"content": [{"type": "text", "text": text}]}

    # --------------------------------------------------------------- tools
    def _call_tool(self, name: str, args: dict) -> dict:
        if name == "search_schemas":
            self.index.rebuild()
            hits = self.index.search(
                args["query"],
                int(args.get("limit", 20)),
                include_descriptions=bool(args.get("include_descriptions", True)),
                description_scope=str(args.get("description_scope", "all")),
                max_description_length=int(args.get("max_description_length", 100)),
            )
            return self._text(
                [
                    {"table": h.table, "column": h.column, "type": h.type,
                     "source": h.source, "description": h.comment}
                    for h in hits
                ]
            )
        if name == "get_schema_details":
            from strake_spark.discovery import get_schema_details

            return self._text(get_schema_details(self.engine.spark, args["table"]))
        if name == "run_python":
            return self._run_python(args)
        raise ValueError(f"unknown tool {name!r}")

    def _run_python(self, args: dict) -> dict:
        import os
        import tempfile

        from strake_spark.sandbox import run_python
        from strake_spark.tracing_agent import AgentSession, code_field

        # Agent-session trace around the sandbox execution (reference
        # mcp instrumentation over tracing/session.py): the script is
        # recorded hash-only unless STRAKE_TRACE_CODE=true
        with AgentSession(metadata={"tool": "run_python",
                                    **code_field(args["script"])}) as sess:
            queries = args.get("queries") or []
            mapping: dict[str, str] = {}
            tmp = tempfile.mkdtemp(prefix="strake-mcp-")
            for i, q in enumerate(queries):
                table = self.engine.execute(q)  # governed: gate/limits apply
                path = os.path.join(tmp, f"q{i}.parquet")
                import pyarrow.parquet as pq

                pq.write_table(table, path)
                mapping[q] = path
            result = run_python(args["script"], query_results=mapping)
            sess.record_event(
                "sandbox_exec",
                {"ok": result.ok,
                 "constraints": (result.attestation.constraints_applied
                                 if result.attestation else []),
                 "attestation_sig": (result.attestation.sign()
                                     if result.attestation else None)},
            )
            if not result.ok:
                sess.termination_reason = "sandbox_error"
        out, hits = self.guard.check(result.stdout)
        payload = {
            "ok": result.ok,
            "stdout": out,
            "stderr": result.stderr,
            "error": result.error,
        }
        if hits:
            payload["guard_matches"] = hits
            # stable classification for agent callers (reference
            # connection.rs:401 raises ErrorCode::PromptInjectionDetected
            # in enforce mode; our guard redacts instead of failing the
            # whole call, but the code travels with the finding)
            from strake_spark.errors import ErrorCode

            payload["guard_code"] = ErrorCode.PROMPT_INJECTION_DETECTED.as_str()
        return self._text(payload)

    # ---------------------------------------------------------------- loop
    def serve_stdio(self, infile=None, outfile=None) -> None:
        infile = infile or sys.stdin
        outfile = outfile or sys.stdout
        for line in infile:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = self.handle(msg)
            if resp is not None:
                outfile.write(json.dumps(resp) + "\n")
                outfile.flush()


def main(argv=None) -> None:
    import argparse
    import os

    import strake_spark as ss

    p = argparse.ArgumentParser(prog="strake-spark-mcp")
    p.add_argument("--config", help="sources YAML", default=None)
    p.add_argument(
        "--guard-mode",
        default=os.environ.get("STRAKE_AGENT_GUARD_MODE"),
        choices=["disabled", "dry_run", "enforce"],
    )
    p.add_argument(
        "--supervise", action="store_true",
        help="run under the sidecar supervisor (restart on exit with "
             "jittered backoff, max-retries cooldown breaker, graceful "
             "shutdown) — the reference server's spawn_sidecar wiring "
             "(crates/runtime/src/sidecar.rs)",
    )
    args = p.parse_args(argv)
    if args.supervise:
        from strake_spark.sidecar import SidecarConfig, spawn_sidecar

        cmd = [sys.executable, "-m", "strake_spark.mcp"]
        if args.config:
            cmd += ["--config", args.config]
        if args.guard_mode:
            cmd += ["--guard-mode", args.guard_mode]
        handle = spawn_sidecar(SidecarConfig(cmd=cmd, env=dict(os.environ)))
        try:
            while True:  # supervisor runs until interrupted
                import time

                time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            handle.shutdown()
        return
    try:
        engine = ss.connect(args.config)
        # precedence: flag/env > YAML security.agent_guard_mode > off
        # (reference strake.yaml:14 carries the mode in config)
        mode = args.guard_mode or getattr(
            engine.config, "agent_guard_mode", "disabled"
        )
        McpServer(engine, guard_mode=mode).serve_stdio()
    except Exception:
        traceback.print_exc(file=sys.stderr)
        raise


if __name__ == "__main__":
    main()
