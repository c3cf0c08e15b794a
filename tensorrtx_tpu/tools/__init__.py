"""Developer tools: tensor-dump parity harness, exporters."""
