"""Shim of the removed setuptools `pkg_resources` API surface the reference
consumes: resource_filename (BaseAviary.py:486,989; BaseControl.py:202).
Python 3.12 in this image ships setuptools without pkg_resources."""
import importlib.util
import os


def resource_filename(package_or_requirement, resource_name):
    spec = importlib.util.find_spec(package_or_requirement)
    if spec is None or spec.origin is None:
        raise ImportError(f"pkg_resources shim: cannot locate "
                          f"{package_or_requirement!r}")
    return os.path.join(os.path.dirname(spec.origin), resource_name)
