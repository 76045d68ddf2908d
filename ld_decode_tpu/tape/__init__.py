"""Tape-format (VHS/S-VHS) FM decode profiles."""
