"""Parity-oracle layer (SURVEY.md §7 `oracle/`): adapter + loader for running the
serial numpy reference against our model data in tests."""
import importlib.util
import os

from .adapter import OracleRobotAdapter

REFERENCE_PATH = os.environ.get("RBD_REFERENCE_PATH", "/root/reference")


def load_reference_class():
    """Load the reference RBDReference class from the read-only reference mount.

    Returns None if the reference is unavailable (tests then fall back to the
    committed golden fixtures).  Nothing is copied into this repo.
    """
    path = os.path.join(REFERENCE_PATH, "RBDReference.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("rbd_reference_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.RBDReference


__all__ = ["OracleRobotAdapter", "load_reference_class", "REFERENCE_PATH"]
