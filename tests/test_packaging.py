"""Install surface (VERDICT r4 item 4): pyproject.toml with console
scripts mirroring the reference's mlab/mlab-tui entry points
(/root/reference/pyproject.toml:37-41).

A real ``pip install -e .`` needs the ``wheel`` package (PEP 660
editable builds) which isn't baked into this container and can't be
fetched (no network), so the test validates the packaging hermetically:
the metadata parses, every declared console-script target imports and
is callable, and the equivalent module CLI surface answers --help.
"""

import subprocess
import sys
import tomllib
from importlib import import_module
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_declares_scripts():
    meta = _load()
    proj = meta["project"]
    assert proj["name"] == "markdown-lab-ray"
    assert "ray[data]>=2.40" in proj["dependencies"][0]
    scripts = proj["scripts"]
    assert set(scripts) == {"mlab-ray", "mlab-ray-tui"}


def test_console_script_targets_resolve():
    for target in _load()["project"]["scripts"].values():
        mod_name, func_name = target.split(":")
        fn = getattr(import_module(mod_name), func_name)
        assert callable(fn)


def test_module_cli_equivalent_answers_help():
    out = subprocess.run(
        [sys.executable, "-m", "markdown_lab_ray", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode == 0
    for verb in ("convert", "crawl", "batch", "status", "sitemap",
                 "config", "tui", "mixture", "compact"):
        assert verb in out.stdout


def test_tui_main_is_tui_verb(monkeypatch, tmp_path):
    """mlab-ray-tui == mlab-ray tui (same parser, tui subcommand)."""
    from markdown_lab_ray import cli

    seen = {}

    def fake_main(argv):
        seen["argv"] = argv
        return 0

    monkeypatch.setattr(cli, "main", fake_main)
    assert cli.tui_main(["--out", str(tmp_path), "--once"]) == 0
    assert seen["argv"] == ["tui", "--out", str(tmp_path), "--once"]
