"""Analysis toolchain tests: summary, comparator, export, visualizer, reporter."""

import json
import os

import pytest

from crs_tpu.evaluation.comparator import ResultsComparator
from crs_tpu.evaluation.export import ResultsExporter
from crs_tpu.evaluation.summary import ResultsSummary


@pytest.fixture()
def result_dirs(tmp_path):
    data = {
        "model_fp32": {"metrics": {"latency_ms_per_token": 10.0, "perplexity": 12.0, "f1_score": 0.5}},
        "model_int8": {"metrics": {"latency_ms_per_token": 6.0, "perplexity": 13.0, "f1_score": 0.45}},
    }
    dirs = []
    for label, content in data.items():
        d = tmp_path / label
        d.mkdir()
        (d / "efficiency_results.json").write_text(json.dumps(content))
        dirs.append(str(d))
    return dirs


def test_summary_load_and_find(result_dirs):
    s = ResultsSummary(result_dirs)
    assert len(s.results) == 2
    vals = s.metric_across_results("latency_ms_per_token")
    assert vals["model_fp32"] == 10.0 and vals["model_int8"] == 6.0


def test_summary_rank_direction(result_dirs):
    s = ResultsSummary(result_dirs)
    rank = s.rank("latency_ms_per_token")
    assert rank[0]["label"] == "model_int8"  # lower latency is better
    rank2 = s.rank("f1_score")
    assert rank2[0]["label"] == "model_fp32"  # higher f1 is better


def test_summary_comparison_table(result_dirs):
    s = ResultsSummary(result_dirs)
    table = s.comparison_table(["latency_ms_per_token", "perplexity"])
    assert "model_fp32" in table and "10.0000" in table


def test_comparator_pairwise(result_dirs):
    c = ResultsComparator.from_directories(result_dirs)
    cmp = c.compare_two("model_int8", "model_fp32", ["latency_ms_per_token", "f1_score"])
    assert cmp["metrics"]["latency_ms_per_token"]["direction"] == "improved"
    assert cmp["metrics"]["f1_score"]["direction"] == "regressed"
    assert cmp["improved"] == 1 and cmp["regressed"] == 1


def test_comparator_significance():
    out = ResultsComparator.statistical_significance_test(10.0, 0.5, 10, 12.0, 0.5, 10)
    assert out["significant"]
    assert out["effect_size"] == "large"


def test_comparator_best_and_leaderboard(result_dirs):
    c = ResultsComparator.from_directories(result_dirs)
    assert c.best_model("latency_ms_per_token")[0] == "model_int8"
    assert c.best_model("f1_score")[0] == "model_fp32"
    board = c.create_leaderboard({"latency_ms_per_token": 1.0, "f1_score": 1.0})
    assert len(board) == 2
    assert board[0]["rank"] == 1


def test_exporter_formats(result_dirs, tmp_path):
    ex = ResultsExporter.from_directories(result_dirs)
    md = ex.to_markdown(metrics=["latency_ms_per_token", "perplexity"])
    assert md.startswith("| model |")
    tex = ex.to_latex(metrics=["latency_ms_per_token"])
    assert r"\toprule" in tex and r"\_" not in tex.split("tabular")[0]
    html = ex.to_html(metrics=["latency_ms_per_token", "f1_score"])
    assert 'class="best"' in html
    paths = ex.export_all(str(tmp_path / "exp"), ["latency_ms_per_token"])
    for p in paths.values():
        assert os.path.exists(p)


def test_exporter_latex_escaping():
    ex = ResultsExporter({"m_1": {"metrics": {"f1_score": 0.5}}})
    tex = ex.to_latex(metrics=["f1_score"])
    assert "m\\_1" in tex


def test_visualizer_plots(result_dirs, tmp_path):
    mpl = pytest.importorskip("matplotlib")
    from crs_tpu.evaluation.visualizer import ResultsVisualizer

    v = ResultsVisualizer.from_directories(result_dirs, out_dir=str(tmp_path / "plots"))
    p = v.plot_metric_comparison("latency_ms_per_token")
    assert p and os.path.exists(p)
    radar = v.plot_radar(["latency_ms_per_token", "perplexity", "f1_score"])
    assert radar and os.path.exists(radar)
    dash = v.plot_dashboard()
    assert dash and os.path.exists(dash)


def test_reporter_end_to_end(result_dirs, tmp_path):
    from crs_tpu.evaluation.reporter import ReportGenerator

    rg = ReportGenerator.from_directories(result_dirs)
    out = rg.generate(str(tmp_path / "report.html"), title="Test Report")
    content = open(out).read()
    assert "Executive summary" in content
    assert "model_int8" in content
    assert "Pairwise comparisons" in content


def test_summary_cli(result_dirs, capsys):
    from crs_tpu.evaluation.summary import main

    assert main(result_dirs + ["--metric", "latency_ms_per_token"]) == 0
    out = capsys.readouterr().out
    assert "model_int8" in out


def test_export_cli(result_dirs, capsys):
    from crs_tpu.evaluation.export import main

    assert main(result_dirs + ["--format", "markdown", "--metrics", "perplexity"]) == 0
    assert "| model |" in capsys.readouterr().out


def test_exporter_worst_cell_highlighting(result_dirs):
    ex = ResultsExporter.from_directories(result_dirs)
    html = ex.to_html(metrics=["latency_ms_per_token", "f1_score"])
    assert 'class="best"' in html and 'class="worst"' in html


def test_visualizer_domain_layouts(tmp_path):
    pytest.importorskip("matplotlib")
    from crs_tpu.evaluation.visualizer import ResultsVisualizer

    results = {
        "m_fp32": {"metrics": {
            "latency_ms_per_token": 10.0, "throughput_tokens_per_sec": 100.0,
            "perplexity": 12.0, "average_accuracy": 0.6,
            "context_sufficiency": 0.8, "context_precision": 0.6,
            "context_coverage": 0.7, "avg_retrieval_time_ms": 2.0,
            "tasks": {"arc_easy": {"score": 0.7}, "boolq": {"score": 0.6}},
        }},
        "m_int8": {"metrics": {
            "latency_ms_per_token": 6.0, "throughput_tokens_per_sec": 160.0,
            "perplexity": 12.5, "average_accuracy": 0.58,
            "context_sufficiency": 0.78, "context_precision": 0.61,
            "context_coverage": 0.69, "avg_retrieval_time_ms": 1.2,
            "tasks": {"arc_easy": {"score": 0.68}, "boolq": {"score": 0.59}},
        }},
    }
    v = ResultsVisualizer(results, out_dir=str(tmp_path))
    eff = v.plot_efficiency()
    assert eff and all(os.path.exists(p) for p in eff)
    perf = v.plot_performance()
    assert len(perf) == 2  # panel + per-task grouped bars
    retr = v.plot_retrieval()
    assert len(retr) == 2  # panel + context-quality triplet


def test_curve_report_tool(tmp_path, capsys):
    """tools/curve_report.py: merges curve JSONs, finds per-budget winners,
    and applies the VERDICT r3 #2 criterion."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import curve_report

    rows = [
        {"rows": 100, "m": 12, "coarse": 2048, "cand": 100, "aniso_eta": 0.0,
         "opq_init": "identity", "bytes_per_vec": 14, "recall_none": 0.40,
         "recall_in_cand": 0.85, "recall_host": 0.84, "ms_per_query": 0.5,
         "scan_ms": 30, "engine": "xla", "device": "cpu"},
        {"rows": 100, "m": 12, "coarse": 2048, "cand": 400, "aniso_eta": 16.0,
         "opq_init": "identity", "bytes_per_vec": 14, "recall_none": 0.47,
         "recall_in_cand": 0.99, "recall_host": 0.95, "ms_per_query": 0.9,
         "scan_ms": 60, "engine": "xla", "device": "cpu"},
        # old-format row without the round-4 fields must not crash
        {"rows": 100, "m": 24, "coarse": 4096, "cand": 100,
         "bytes_per_vec": 26, "recall_none": 0.6, "recall_in_cand": 0.9,
         "recall_host": 0.97, "ms_per_query": 1.5, "scan_ms": 90,
         "engine": "xla", "device": "cpu"},
    ]
    f = tmp_path / "curve.json"
    f.write_text(json.dumps(rows))
    sys.argv = ["curve_report", str(f), "--target", "0.9", "--budget", "16"]
    assert curve_report.main() == 0
    out = capsys.readouterr().out
    assert "VERDICT criterion MET" in out
    assert "14 B/vec: 0.9500" in out  # aniso row wins its budget
    assert "26 B/vec: 0.9700" in out  # legacy row defaults applied
