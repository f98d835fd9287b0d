"""raywin — Ray-Data-native point-in-time feature-engineering engine.

From-scratch reimplementation of the capabilities of airbnb/chronon
(reference at /root/reference, cited per-file) on ray.data.Dataset
pipelines.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
