"""Sources: parquet/Iceberg table registry + OSM XML/OSC ingest."""
