"""Sources: file readers + discover, JDBC predicate builders, changelogs."""
