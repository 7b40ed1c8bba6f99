from . import se3, masked  # noqa: F401
