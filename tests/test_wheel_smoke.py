"""CI-style wrapper for the wheel-install smoke (scripts/wheel_smoke.py):
wheel build → clean venv install → stream extraction via the installed
``extractpdf4j_spark.job`` with the repo absent from sys.path."""

import os
import sys

import pytest


@pytest.mark.wheel
def test_wheel_install_and_job_runs_from_installed_package():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import wheel_smoke
    wheel_smoke.run()
