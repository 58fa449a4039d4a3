"""CLI surface: run / test / lint / blobl / echo (internal/cli/run.go
analog)."""

from __future__ import annotations

import io
import json
import sys

import pytest

from bento_ray.__main__ import main


def test_cli_blobl_stdin(monkeypatch, capsys):
    monkeypatch.setattr("sys.stdin",
                        io.StringIO('{"y":"hi"}\n{"y":"there"}\n'))
    rc = main(["blobl", "root.x = this.y.uppercase()"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert [json.loads(x) for x in out] == [{"x": "HI"}, {"x": "THERE"}]


def test_cli_blobl_error_status(monkeypatch, capsys):
    monkeypatch.setattr("sys.stdin", io.StringIO('{"y":1}\n'))
    rc = main(["blobl", 'root.x = throw("nope")'])
    assert rc == 1
    assert "nope" in capsys.readouterr().err


def test_cli_test_runner(capsys):
    rc = main(["test", "/root/reference/config/test/bloblang/csv.yaml"])
    out = capsys.readouterr().out
    assert rc == 0 and "2 cases passed" in out


def test_cli_lint_catches_unknown_processor(tmp_path, capsys):
    good = tmp_path / "good.yaml"
    good.write_text("pipeline:\n  processors:\n"
                    "    - mapping: 'root = this'\n")
    bad = tmp_path / "bad.yaml"
    bad.write_text("pipeline:\n  processors:\n"
                   "    - frobnicate: {}\n")
    assert main(["lint", str(good)]) == 0
    assert main(["lint", str(bad)]) == 1
    assert "frobnicate" in capsys.readouterr().out


def test_cli_lint_dangling_cache_ref(tmp_path, capsys):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "pipeline:\n  processors:\n"
        "    - dedupe:\n        cache: nope\n"
        "        key: '${! content() }'\n")
    assert main(["lint", str(cfg)]) == 1
    assert "unknown cache" in capsys.readouterr().out


def test_cli_echo_resolves_env(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / "e.yaml"
    cfg.write_text("pipeline:\n  processors:\n"
                   "    - mapping: 'root.v = \"${FOO:dflt}\"'\n")
    rc = main(["echo", str(cfg)])
    assert rc == 0
    assert "dflt" in capsys.readouterr().out
