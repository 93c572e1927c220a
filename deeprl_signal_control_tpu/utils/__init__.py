from .experiment import (
    Counter,
    check_dir,
    copy_file,
    find_file,
    init_dir,
    init_log,
    init_test_flag,
)
