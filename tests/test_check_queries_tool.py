"""tools/check_queries.py chunked-sweep machinery (round-4 item #3).

The parent must re-run exactly the queries a crashed child failed to
report, and give up with explicit CRASH rows after bounded retries —
one infra crash can never silently mask results."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "check_queries", os.path.join(REPO, "tools", "check_queries.py"))
cq = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cq)


class TestParseResults:
    def test_parses_all_statuses(self):
        out = ("ok    q_one               10 rows   0.1s\n"
               "rows  q_two               20 rows   0.2s (rows-only)\n"
               "FAIL  q_three             rows 1 != 2   0.3s\n"
               "random log line\n")
        got = cq._parse_results(out)
        assert got == {"q_one": "ok", "q_two": "rows", "q_three": "FAIL"}

    def test_ignores_ray_noise(self):
        assert cq._parse_results("2026-08-19 INFO blah\n") == {}


class TestRunChunked:
    def _patch(self, monkeypatch, behavior):
        """behavior(names) -> dict of results the fake child reports."""
        calls = []

        def fake_child(sf_dir, names):
            calls.append(list(names))
            got = behavior(names)
            return got, len(got) < len(names)

        monkeypatch.setattr(cq, "_run_child", fake_child)
        return calls

    def test_all_green_single_pass(self, monkeypatch, capsys):
        calls = self._patch(monkeypatch, lambda ns: {n: "ok" for n in ns})
        rc = cq.run_chunked("/sf", [f"q{i}" for i in range(10)], 4)
        assert rc == 0
        assert calls == [["q0", "q1", "q2", "q3"],
                         ["q4", "q5", "q6", "q7"], ["q8", "q9"]]
        assert "10 queries: 10 hash-green" in capsys.readouterr().out

    def test_crash_tail_retried_in_fresh_child(self, monkeypatch, capsys):
        # first attempt: the child dies after reporting half its chunk
        state = {"crashed_once": False}

        def behavior(ns):
            if not state["crashed_once"] and len(ns) > 2:
                state["crashed_once"] = True
                return {n: "ok" for n in ns[: len(ns) // 2]}
            return {n: "ok" for n in ns}

        calls = self._patch(monkeypatch, behavior)
        rc = cq.run_chunked("/sf", [f"q{i}" for i in range(8)], 8)
        assert rc == 0
        # retry ran EXACTLY the unreported tail, nothing else re-ran
        assert calls[0] == [f"q{i}" for i in range(8)]
        assert calls[1] == [f"q{i}" for i in range(4, 8)]
        assert "8 queries: 8 hash-green" in capsys.readouterr().out

    def test_persistent_crash_reports_crash_rows(self, monkeypatch, capsys):
        # q3 kills every child it lands in: after the retry budget the
        # parent must mark it CRASH and exit nonzero — never silence it
        def behavior(ns):
            return {n: "ok" for n in ns if n != "q3"}

        self._patch(monkeypatch, behavior)
        rc = cq.run_chunked("/sf", [f"q{i}" for i in range(5)], 5)
        assert rc == 1
        out = capsys.readouterr().out
        assert "CRASH: q3" in out
        assert "1 failures" in out

    def test_failures_propagate_exit_code(self, monkeypatch):
        def behavior(ns):
            return {n: ("FAIL" if n == "q1" else "ok") for n in ns}

        self._patch(monkeypatch, behavior)
        assert cq.run_chunked("/sf", ["q0", "q1", "q2"], 3) == 1
