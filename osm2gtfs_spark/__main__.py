"""``python -m osm2gtfs_spark -c config.json`` — see cli.py."""

from osm2gtfs_spark.cli import main

if __name__ == "__main__":
    main()
