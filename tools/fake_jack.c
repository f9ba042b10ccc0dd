/* Minimal fake libjack for testing the ctypes JACK client
 * (odr_audioenc_tpu/io/jack_in.py) without a JACK server: implements the
 * handful of entry points the client uses and drives the process callback
 * from a worker thread with a deterministic sine per port, then fires the
 * shutdown callback.  Built by tests into .scratch/libfakejack.so. */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <pthread.h>
#include <unistd.h>
#include <math.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int (*process_cb_t)(uint32_t, void *);
typedef void (*shutdown_cb_t)(void *);

#define NFRAMES 256
#define NCALLS 20

static process_cb_t g_proc;
static void *g_proc_arg;
static shutdown_cb_t g_down;
static void *g_down_arg;
static float g_bufs[8][NFRAMES];
static int g_nports = 0;
static pthread_t g_thread;
static volatile int g_active = 0;

void *jack_client_open(const char *name, int opts, long *status) {
  (void)name; (void)opts;
  if (status) *status = 0;
  return (void *)0x1;
}

uint32_t jack_get_sample_rate(void *c) { (void)c; return 48000; }

int jack_set_process_callback(void *c, process_cb_t cb, void *arg) {
  (void)c; g_proc = cb; g_proc_arg = arg; return 0;
}

void jack_on_shutdown(void *c, shutdown_cb_t cb, void *arg) {
  (void)c; g_down = cb; g_down_arg = arg;
}

void *jack_port_register(void *c, const char *name, const char *type,
                         unsigned long flags, unsigned long bufsz) {
  (void)c; (void)name; (void)type; (void)flags; (void)bufsz;
  if (g_nports >= 8) return NULL;
  return (void *)g_bufs[g_nports++];
}

float *jack_port_get_buffer(void *port, uint32_t nframes) {
  (void)nframes;
  return (float *)port;
}

static void *run(void *arg) {
  (void)arg;
  for (int k = 0; k < NCALLS && g_active; k++) {
    for (int p = 0; p < g_nports; p++)
      for (int i = 0; i < NFRAMES; i++)
        g_bufs[p][i] = 0.25f * (p + 1) *
            sinf(2.0f * 3.14159265f * 997.0f * (k * NFRAMES + i) / 48000.0f);
    if (g_proc) g_proc(NFRAMES, g_proc_arg);
    usleep(1000);
  }
  if (g_down) g_down(g_down_arg);
  return NULL;
}

int jack_activate(void *c) {
  (void)c;
  g_active = 1;
  pthread_create(&g_thread, NULL, run, NULL);
  return 0;
}

int jack_client_close(void *c) {
  (void)c;
  if (g_active) {
    g_active = 0;
    pthread_join(g_thread, NULL);
  }
  return 0;
}

#ifdef __cplusplus
}
#endif
