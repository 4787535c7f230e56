"""CLI surface: parser structure (slim, no heavy imports) + end-to-end."""

import json

import pytest

from cli.main import build_parser, main


ALL_COMMANDS = [
    "add", "ask", "preview", "stats", "dump", "restore", "vacuum",
    "rebuild", "list", "show", "delete", "reingest",
]


class TestParser:
    def test_all_twelve_subcommands_registered(self):
        parser = build_parser()
        sub = next(
            a for a in parser._actions
            if isinstance(a, type(parser._subparsers._group_actions[0]))
        )
        for cmd in ALL_COMMANDS:
            assert cmd in sub.choices, cmd

    def test_ask_defaults(self):
        args = build_parser().parse_args(["ask", "hello"])
        assert args.k == 8
        assert args.hybrid == "on"
        assert args.language == "auto"

    def test_invalid_doc_type_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["add", "x.pdf", "--doc-type", "exe"])

    def test_invalid_hybrid_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["ask", "q", "--hybrid", "maybe"])

    def test_dump_requires_path(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["dump"])


class TestEndToEnd:
    @pytest.fixture()
    def env(self, tmp_index_env, tmp_path, monkeypatch, capsys):
        from classmate_rag_tpu.pipeline.runtime import reset_runtime

        reset_runtime()
        doc = tmp_path / "doc.md"
        doc.write_text(
            "Gradient descent minimizes a loss function iteratively. "
            "The learning rate controls the step size."
        )
        yield doc, capsys
        reset_runtime()

    def _run(self, capsys, argv):
        code = main(argv)
        out = capsys.readouterr().out
        return code, json.loads(out) if out.strip() else None

    def test_add_ask_delete_flow(self, env):
        doc, capsys = env
        code, res = self._run(capsys, [
            "add", str(doc), "--course", "ml", "--tags", "week1",
        ])
        assert code == 0
        assert res["upserted"] == 1

        code, res = self._run(capsys, ["preview", "gradient descent", "--k", "2"])
        assert code == 0
        assert res["items"]
        assert "gradient" in res["items"][0]["snippet"].lower()

        code, res = self._run(capsys, ["ask", "what does gradient descent do"])
        assert code == 0
        assert "[1]" in res["answer"]

        code, res = self._run(capsys, ["stats"])
        assert res["vectors"] == 1

        code, res = self._run(capsys, ["delete", "--path", str(doc)])
        assert code == 0
        assert res["vector_deleted"] == 1

        code, res = self._run(capsys, ["stats"])
        assert res["vectors"] == 0

    def test_bare_delete_refuses(self, env):
        doc, capsys = env
        code = main(["delete"])
        assert code == 1
