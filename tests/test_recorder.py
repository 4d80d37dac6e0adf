"""Recorder: exp-dir layout, cfg dump, arch DAG dumps (txt/dot/png),
git-reproducibility warnings. Parity: anakin/utils/recorder.py:42,150-156."""
import os

from artiboost_tpu.utils.recorder import Recorder, _draw_arch_png


class _FakeArch:
    names = ["HybridBaseline", "MLP_O"]

    def to_graph(self):
        return [("HybridBaseline", "MLP_O")]


def test_recorder_dirs_and_cfg(tmp_path):
    cfg = {"TRAIN": {"EPOCHS": 1}}
    rec = Recorder("default", cfg, root=str(tmp_path), timestamp="t")
    assert os.path.isdir(rec.ckpt_dir)
    assert os.path.isdir(rec.eval_dir)
    assert os.path.isfile(os.path.join(rec.dump_path, "dump_cfg.yaml"))


def test_record_arch_dumps_txt_dot_png(tmp_path):
    rec = Recorder("default", {}, root=str(tmp_path), timestamp="t")
    rec.record_arch(_FakeArch())
    base = os.path.join(rec.dump_path, "arch")
    assert os.path.isfile(base + ".txt")
    assert os.path.isfile(base + ".dot")
    assert os.path.isfile(base + ".png") and os.path.getsize(base + ".png") > 0
    dot = open(base + ".dot").read()
    assert '"HybridBaseline" -> "MLP_O"' in dot


def test_draw_arch_png_diamond(tmp_path):
    # multi-layer DAG with a join node exercises layering + arrowheads
    names = ["a", "b", "c", "d"]
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    p = str(tmp_path / "arch.png")
    _draw_arch_png(names, edges, p)
    assert os.path.getsize(p) > 0


def test_named_exp_warns_on_dirty_tree(tmp_path, caplog):
    # this repo's working tree state varies; the constructor must never
    # raise either way, and must log something about the commit
    import logging
    with caplog.at_level(logging.INFO, logger="artiboost"):
        Recorder("named_exp", {}, root=str(tmp_path), timestamp="t")
