from .pipeline import StereoMatcher, match_pair  # noqa: F401
