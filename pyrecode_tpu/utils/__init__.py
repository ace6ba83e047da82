"""Tools layer: calibration, offline converters, live viewer.

Capability parity with the reference ``pyrecode/utils/`` (SURVEY.md §2 layer 6).
"""
