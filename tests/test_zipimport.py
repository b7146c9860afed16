"""Cluster-deploy regression: the package must work when imported from the
spark-submit --py-files zip (zipimport) — executors never see a checkout,
so every resource load has to go through importlib.resources."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {zip_path!r})
import pdfminer_six_spark
assert "zip" in pdfminer_six_spark.__file__, pdfminer_six_spark.__file__
from pdfminer_six_spark.core.extract import extract_text
text = extract_text(open("/root/reference/samples/jo.pdf", "rb").read())
assert len(text) > 1000
from pdfminer_six_spark.core.ccitt import g4_decode, g4_encode
import numpy as np
img = np.zeros((3, 10), dtype=bool)
assert g4_decode(g4_encode(img), 10)
print("ZIPIMPORT_OK")
"""


def test_package_runs_from_zip(tmp_path):
    subprocess.run(
        ["bash", os.path.join(REPO, "jobs", "package.sh")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "pdfminer_six_spark.zip")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(zip_path=zip_path)],
        capture_output=True, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert b"ZIPIMPORT_OK" in out.stdout
