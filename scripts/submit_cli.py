"""spark-submit launcher for the engine CLI (spark-submit cannot run
``-m package`` directly):

    spark-submit --master ... --py-files engine.zip \
        scripts/submit_cli.py validate --input TABLE --out OUT
"""

import sys

from dcc_validate_metadata_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
