"""Plan-time helpers: page/turn selection, snapshot normalization."""
