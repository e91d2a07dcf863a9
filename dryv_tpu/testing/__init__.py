"""Test-support utilities: the libavcodec conformance oracle and fixture helpers."""
