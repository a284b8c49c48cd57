"""Models: the BaSiC shading model and filter configuration surface."""

from .basic import BaSiC  # noqa: F401
