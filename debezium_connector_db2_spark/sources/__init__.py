"""Sources: binlog generator, binlog lake reader, capture registry."""
