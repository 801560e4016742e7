"""Agent-side tracing surface (reference python/strake/tracing/
session.py): emitters, env switches, AgentSession records, the @span
decorator on sync and async functions, and code_field privacy."""

from __future__ import annotations

import asyncio
import json

import pytest

from strake_spark import tracing_agent as TA


class Collector(TA.TraceEmitter):
    def __init__(self):
        self.records = []

    def emit(self, record):
        self.records.append(record)


@pytest.fixture(autouse=True)
def _reset_emitter():
    TA.set_emitter(None)
    yield
    TA.set_emitter(None)


class TestEmitters:
    def test_disabled_env_yields_null_emitter(self, monkeypatch):
        monkeypatch.setenv("STRAKE_TRACE_ENABLED", "false")
        assert isinstance(TA.get_emitter(), TA.NullEmitter)

    def test_file_emitter_one_file_per_session(self, tmp_path):
        em = TA.JsonLinesFileEmitter(trace_dir=tmp_path)
        em.emit({"event": "session_start", "session_id": "abc"})
        em.emit({"event": "x", "session_id": "abc"})
        em.close()
        files = list(tmp_path.glob("*_abc.jsonl"))
        assert len(files) == 1
        lines = [json.loads(line) for line in files[0].read_text().splitlines()]
        assert [r["event"] for r in lines] == ["session_start", "x"]

    def test_trace_dir_env_override(self, tmp_path, monkeypatch):
        monkeypatch.setenv("STRAKE_TRACE_DIR", str(tmp_path / "custom"))
        em = TA.get_emitter()
        assert isinstance(em, TA.JsonLinesFileEmitter)
        assert em.trace_dir == (tmp_path / "custom").resolve()

    def test_set_emitter_override_kept(self):
        c = Collector()
        TA.set_emitter(c)
        assert TA.get_emitter() is c


class TestAgentSession:
    def test_start_end_records(self):
        c = Collector()
        with TA.AgentSession(emitter=c, metadata={"tool": "t"}) as s:
            s.record_event("custom", {"k": 1})
        events = [r["event"] for r in c.records]
        assert events == ["session_start", "custom", "session_end"]
        assert c.records[0]["tool"] == "t"
        assert all(r["session_id"] == s.session_id for r in c.records)
        end = c.records[-1]
        assert end["termination_reason"] == "natural"
        assert end["duration_ms"] >= 0

    def test_error_termination_reason(self):
        c = Collector()
        with pytest.raises(ValueError):
            with TA.AgentSession(emitter=c):
                raise ValueError("boom")
        assert c.records[-1]["termination_reason"] == "error:ValueError"


class TestSpanDecorator:
    def test_sync_ok_and_error(self):
        c = Collector()
        TA.set_emitter(c)

        @TA.span(span_type="tool_call")
        def work(x):
            if x < 0:
                raise RuntimeError("neg")
            return x * 2

        assert work(3) == 6
        with pytest.raises(RuntimeError):
            work(-1)
        ok, err = c.records
        assert ok["status"] == "ok" and ok["name"] == "work"
        assert err["status"] == "error" and "RuntimeError: neg" in err["error"]
        assert ok["latency_ms"] >= 0

    def test_async_function(self):
        c = Collector()
        TA.set_emitter(c)

        @TA.span(span_type="sandbox_exec", name="aio")
        async def awork():
            return 7

        assert asyncio.run(awork()) == 7
        assert c.records[0]["name"] == "aio"
        assert c.records[0]["span_type"] == "sandbox_exec"

    def test_capture_args_records_types_not_values(self):
        c = Collector()
        TA.set_emitter(c)

        @TA.span(capture_args=True)
        def f(secret, n=2):
            return n

        f("hunter2", n=3)
        args = c.records[0]["args"]
        assert args["positional"] == ["str[7]"]
        assert args["keyword"] == {"n": "int"}
        assert "hunter2" not in json.dumps(c.records[0])


class TestCodeField:
    def test_hash_only_by_default(self, monkeypatch):
        monkeypatch.delenv("STRAKE_TRACE_CODE", raising=False)
        cf = TA.code_field("print('x')")
        assert "code" not in cf
        assert cf["code_hash"] == TA.hash_code("print('x')")
        assert cf["code_size_bytes"] == len("print('x')")

    def test_full_capture_when_enabled(self, monkeypatch):
        monkeypatch.setenv("STRAKE_TRACE_CODE", "true")
        cf = TA.code_field("print('x')")
        assert cf["code"] == "print('x')"


class TestMcpIntegration:
    def test_run_python_emits_session_with_attestation(self, spark):
        import strake_spark as ss
        from strake_spark.mcp import McpServer
        from tests.conftest import SF_DIR

        c = Collector()
        TA.set_emitter(c)
        eng = ss.connect(
            {"sources": [{"name": "tr", "type": "parquet", "url": SF_DIR,
                          "tables": [{"name": "nation"}]}]},
            spark=spark,
        )
        srv = McpServer(eng)
        out = srv.handle({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": "run_python",
                       "arguments": {"script": "print('traced')"}},
        })
        assert "traced" in json.dumps(out)
        events = [r["event"] for r in c.records]
        assert events == ["session_start", "sandbox_exec", "session_end"]
        assert "code_hash" in c.records[0]  # hash-only default
        exec_rec = c.records[1]
        assert exec_rec["ok"] is True
        assert "rlimits" in exec_rec["constraints"]
        assert len(exec_rec["attestation_sig"]) == 64
