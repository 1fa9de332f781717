"""External table sources/sinks (SURVEY §2.1): JDBC federation (jdbc/mysql/
postgresql table engines), exercised end-to-end against the embedded Derby
driver that ships with Spark."""
