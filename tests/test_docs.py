"""The rendered documentation site (docs/gen_site.py) — the browsable
analog of the reference's built Sphinx site (reference
docs/source/index.rst + api_nif_*.rst pages)."""
import os
import subprocess
import sys


def test_gen_site_builds_all_pages(tmp_path):
    out = str(tmp_path / "site")
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.argv=['gen_site']; "
         "import importlib.util, os; "
         "spec = importlib.util.spec_from_file_location("
         "'gen_site', 'docs/gen_site.py'); "
         "m = importlib.util.module_from_spec(spec); "
         "spec.loader.exec_module(m); "
         f"m.main({out!r})"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pages = sorted(os.listdir(out))
    # every guide + one API page per documented subpackage
    assert "index.html" in pages and "parity.html" in pages
    for must in ("nif_tpu_models.html", "nif_tpu_optimizers.html",
                 "nif_tpu_training.html", "nif_tpu_ops.html"):
        assert must in pages, pages
    models = open(os.path.join(out, "nif_tpu_models.html")).read()
    # real extracted content: classes, methods, reference citations
    assert "NIFMultiScale" in models and "apply_grouped" in models
    assert 'class="kind"' in models and "reference" in models
    index = open(os.path.join(out, "index.html")).read()
    assert "nav" in index and "Quickstart" in index
