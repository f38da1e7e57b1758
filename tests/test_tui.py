"""TUI: pure render core + the --once CLI surface (no terminal).

The interactive curses loop is a thin pager over render_screen; these
tests cover everything the loop paints (reference tui.py:432-821
surface re-expressed — status / rounds / config tabs)."""

import json

from markdown_lab_ray.tui import (
    TABS,
    collect_status,
    render_config_lines,
    render_screen,
)


def _fake_crawl_dir(tmp_path, finished=False):
    for rno, entry in enumerate([
            {"scheduled": 10, "fetched": 9, "failed": 1, "deferred": 5,
             "timings": {"schedule": 1.0, "fetch": 2.5}},
            {"scheduled": 5, "fetched": 5, "failed": 0, "deferred": 0}]):
        rdir = tmp_path / "rounds" / f"round={rno}"
        rdir.mkdir(parents=True)
        (rdir / "_MANIFEST.json").write_text(json.dumps(entry))
    partial = tmp_path / "rounds" / "round=2"
    partial.mkdir()
    if finished:
        (tmp_path / "_CRAWL.json").write_text(json.dumps({"rounds": 2}))
    return tmp_path


def test_collect_status_totals_and_partials(tmp_path):
    snap = collect_status(str(_fake_crawl_dir(tmp_path)))
    assert snap.exists and not snap.finished
    assert snap.totals == {"scheduled": 15, "fetched": 14, "failed": 1,
                           "deferred": 5}
    assert snap.partial_rounds == [2]
    assert [r["round"] for r in snap.rounds] == [0, 1]


def test_collect_status_empty_dir(tmp_path):
    snap = collect_status(str(tmp_path))
    assert not snap.exists
    assert "no crawl output" in "\n".join(render_screen("status", snap))


def test_render_screen_all_tabs(tmp_path):
    snap = collect_status(str(_fake_crawl_dir(tmp_path, finished=True)))
    status = "\n".join(render_screen("status", snap))
    assert "FINISHED" in status
    assert "15" in status and "fetched: 14" in status
    assert "[####" in status  # progress bar renders
    rounds = "\n".join(render_screen("rounds", snap))
    assert "PARTIAL" in rounds and "total" in rounds
    config = "\n".join(render_screen("config", snap))
    assert "chunk_size = 1000" in config


def test_render_screen_clips_to_geometry(tmp_path):
    snap = collect_status(str(_fake_crawl_dir(tmp_path)))
    frame = render_screen("rounds", snap, width=20, height=4)
    assert len(frame) == 4
    assert all(len(ln) <= 20 for ln in frame)


def test_config_lines_reflect_env(monkeypatch):
    monkeypatch.setenv("MARKDOWN_LAB_CHUNK_SIZE", "512")
    lines = render_config_lines()
    assert "chunk_size = 512" in lines


def test_tui_once_cli(tmp_path, capsys):
    from markdown_lab_ray.cli import main

    _fake_crawl_dir(tmp_path)
    assert main(["tui", "--out", str(tmp_path), "--once"]) == 0
    out = capsys.readouterr().out
    assert "crawl monitor" in out and "IN PROGRESS" in out

    assert main(["tui", "--out", str(tmp_path), "--once",
                 "--tab", "rounds"]) == 0
    assert "PARTIAL" in capsys.readouterr().out

    # missing dir: exit 2 on data tabs, 0 on config (still renderable)
    assert main(["tui", "--out", str(tmp_path / "nope"), "--once"]) == 2
    capsys.readouterr()
    assert main(["tui", "--out", str(tmp_path / "nope"), "--once",
                 "--tab", "config"]) == 0


def test_tabs_constant_matches_cli_choices():
    assert TABS == ("status", "rounds", "config")
