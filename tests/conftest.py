import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
SAMPLES = os.path.join(REFERENCE, "samples")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def import_reference():
    """Import the reference pdfminer.six in place (read-only) for
    differential tests and golden generation."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import pdfminer  # noqa: F401

    return pdfminer
