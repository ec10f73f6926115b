"""Sources & sinks: synthetic pages corpus, partitioned graph sink,
checkpoint/resume bookkeeping."""
