"""Sources & sinks: transcript synthesizer, N-Quads IO, format registry."""
