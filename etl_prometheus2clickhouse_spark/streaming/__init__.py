"""Job lifecycle: batch ``run_once`` parity and the Structured Streaming
variant with write-then-commit epoch ordering."""
