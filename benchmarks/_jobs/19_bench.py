import os, runpy, sys
os.chdir("/root/repo")
sys.argv = ["bench.py"]
runpy.run_path("/root/repo/bench.py", run_name="__main__")
