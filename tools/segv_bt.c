/* Native-backtrace crash handler for debugging the documented full-suite
 * SIGSEGV (CLAUDE.md "Environment gotchas"): this box has no gdb and its
 * block device writes ~2-4 MB/s (multi-GB core dumps are unusable), so the
 * crashing process prints its own native stack with glibc backtrace().
 *
 * Build:  gcc -shared -fPIC -O1 -g -o /tmp/segv_bt.so tools/segv_bt.c
 * Use  :  import ctypes; ctypes.CDLL("/tmp/segv_bt.so").install_bt_handler()
 *         (after jax / absl have installed their own handlers, so this one
 *         runs first and chains to them)
 *
 * Async-signal-safety: backtrace_symbols_fd writes straight to fd 2 without
 * malloc; the first backtrace() call is made eagerly at install time so
 * libgcc's unwinder is already initialized when the real signal hits.
 */
#define _GNU_SOURCE
#include <execinfo.h>
#include <signal.h>
#include <string.h>
#include <unistd.h>

static struct sigaction prev_segv, prev_abrt, prev_bus;

static void write_str(const char *s) {
    ssize_t unused = write(2, s, strlen(s));
    (void)unused;
}

static void handler(int sig, siginfo_t *si, void *ctx) {
    void *buf[128];
    int n = backtrace(buf, 128);
    write_str("\n=== segv_bt native backtrace (signal ");
    char c = '0' + (sig % 10);
    ssize_t unused = write(2, &c, 1);
    (void)unused;
    write_str(") ===\n");
    backtrace_symbols_fd(buf, n, 2);
    write_str("=== end segv_bt backtrace ===\n");
    struct sigaction *prev =
        sig == SIGSEGV ? &prev_segv : sig == SIGBUS ? &prev_bus : &prev_abrt;
    if ((prev->sa_flags & SA_SIGINFO) && prev->sa_sigaction) {
        prev->sa_sigaction(sig, si, ctx); /* chain (faulthandler etc.) */
    } else if (!(prev->sa_flags & SA_SIGINFO) && prev->sa_handler &&
               prev->sa_handler != SIG_IGN && prev->sa_handler != SIG_DFL) {
        prev->sa_handler(sig);
    }
    signal(sig, SIG_DFL);
    raise(sig);
}

void install_bt_handler(void) {
    void *warm[4];
    backtrace(warm, 4); /* eager unwinder init: no lazy dlopen in the handler */
    struct sigaction sa;
    memset(&sa, 0, sizeof sa);
    sa.sa_sigaction = handler;
    sigemptyset(&sa.sa_mask);
    sa.sa_flags = SA_SIGINFO | SA_ONSTACK;
    sigaction(SIGSEGV, &sa, &prev_segv);
    sigaction(SIGABRT, &sa, &prev_abrt);
    sigaction(SIGBUS, &sa, &prev_bus);
}
