"""Robot model layer: URDF parsing -> RobotModel pytree (SURVEY.md §7 `model/`)."""
import os

from .robot import RobotModel, make_model
from .urdf import parse_urdf

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def load_asset(name: str, **kw) -> RobotModel:
    """Load a bundled test/benchmark model by name (e.g. 'arm7', 'quadruped12',
    'humanoid30')."""
    path = os.path.join(_ASSETS, name if name.endswith(".urdf") else name + ".urdf")
    if not os.path.exists(path):
        from ..assets.generate import main as _gen
        _gen()
    return parse_urdf(path, **kw)


__all__ = ["RobotModel", "make_model", "parse_urdf", "load_asset"]
